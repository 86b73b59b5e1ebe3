"""CLI surface regression: python -m go_boilerpipe_ray extract."""

from __future__ import annotations

import json
import subprocess
import sys

from .golden import load_goldens

REPO = "/root/repo"


def _run(args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "go_boilerpipe_ray", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd=REPO,
    )


def test_cli_extract_golden_doc():
    g = load_goldens()[0]
    p = _run(["extract", "--url", g.url, f"/root/reference/testdata/0.html"])
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)
    assert out["title"] == g.title
    assert out["content"] == g.content


def test_cli_extract_stdin_garbage_is_clean():
    p = _run(["extract"], stdin="<<<garbage &&& <a href=")
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)
    assert out["content"] == ""


def test_cli_lineage_lists_all_filters():
    p = _run(["extract", "--lineage"], stdin="<html><body><p>hello world text</p></body></html>")
    assert p.returncode == 0, p.stderr
    out = json.loads(p.stdout)
    assert len(out["lineage"]) == 12


def test_cli_missing_file_clean_error():
    # A nonexistent path is treated as a URL (extract.go:55-78) and the
    # fetch failure is a clean error, mirroring "Error getting document".
    p = _run(["extract", "/nonexistent.html"])
    assert p.returncode == 1
    assert p.stderr.startswith("error getting document:")


def test_cli_extract_url_fetches_with_cookie_client():
    """URL mode end-to-end against a local HTTP server: the first request
    sets a cookie and redirects; the handler serves the document only if
    the cookie came back — exercising the cookie-jar client the reference
    uses (extract.go:84-106)."""
    import http.server
    import threading

    html = "<html><head><title>Net Doc</title></head><body></body></html>"

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/start":
                self.send_response(302)
                self.send_header("Set-Cookie", "sid=abc123")
                self.send_header("Location", "/doc/2021-07-19")
                self.end_headers()
            elif self.path == "/doc/2021-07-19":
                if "sid=abc123" not in (self.headers.get("Cookie") or ""):
                    self.send_error(403)
                    return
                body = html.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        p = _run(["extract", f"http://127.0.0.1:{port}/start"])
        assert p.returncode == 0, p.stderr
        out = json.loads(p.stdout)
        assert out["title"] == "Net Doc"
        # Date derived from the final URL is NOT applied (the fetched URL
        # only feeds --url when --url is absent; the redirect target is
        # not the CLI argument) — but the CLI arg itself has no date.
        p404 = _run(["extract", f"http://127.0.0.1:{port}/missing"])
        assert p404.returncode == 1
        assert "404" in p404.stderr
    finally:
        srv.shutdown()


def test_cli_extract_url_date_derivation():
    import http.server
    import threading

    html = "<html><head><title>Dated</title></head><body></body></html>"

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = html.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        p = _run(["extract", f"http://127.0.0.1:{port}/news/2016-12-15-story"])
        assert p.returncode == 0, p.stderr
        out = json.loads(p.stdout)
        assert out["date"] == "2016-12-15T00:00:00+00:00"
    finally:
        srv.shutdown()


def test_cli_run_job_end_to_end(ray_session, tmp_path):
    """The `run` subcommand (the ray-job-submit entry shape) completes a
    resumable partitioned extraction and reports manifest metrics.  Runs
    in a subprocess with its own Ray session (the CLI owns one)."""
    import pyarrow.parquet as pq

    from go_boilerpipe_ray.sources.fixtures import golden7_chunked_table

    spans = str(tmp_path / "spans.parquet")
    pq.write_table(golden7_chunked_table(2), spans)
    out = str(tmp_path / "out")
    p = _run(["run", spans, out, "--partitions", "4"])
    assert p.returncode == 0, p.stderr[-500:]
    res = json.loads(p.stdout.strip().splitlines()[-1])
    assert res["completed_partitions"] == 4
    assert res["metrics"]["n_docs"] == 7
    assert res["metrics"]["n_errors"] == 0
    # Second invocation is a resume no-op over the same manifest.
    p2 = _run(["run", spans, out, "--partitions", "4"])
    assert p2.returncode == 0
    res2 = json.loads(p2.stdout.strip().splitlines()[-1])
    assert res2["metrics"]["n_docs"] == 7


def test_serve_ui_end_to_end():
    """The serve UI (serve.go:25-148 mirror): index form, /extract?url=
    fetches + extracts + renders the StringToHTML content view and the
    per-filter change log; missing url is a 400; POST is a 405."""
    import http.server
    import threading
    import urllib.error
    import urllib.request

    from go_boilerpipe_ray.__main__ import _build_server

    doc_html = open(
        "/root/reference/testdata/0.html", encoding="utf-8", errors="replace"
    ).read()

    class Source(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            data = doc_html.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    src = http.server.HTTPServer(("127.0.0.1", 0), Source)
    threading.Thread(target=src.serve_forever, daemon=True).start()
    ui = _build_server(0)
    threading.Thread(target=ui.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{ui.server_address[1]}"
        with urllib.request.urlopen(f"{base}/") as r:
            index = r.read().decode()
        assert r.status == 200 and "/extract" in index and "<form" in index

        doc_url = f"http://127.0.0.1:{src.server_address[1]}/2013/11/day-18.html"
        with urllib.request.urlopen(f"{base}/extract?url={doc_url}") as r:
            page = r.read().decode()
        assert "Day 18: Boilerpipe" in page           # extracted title
        assert "<p>Day 18: Boilerpipe" in page        # StringToHTML view
        assert "TerminatingBlocks" in page            # filter log rendered
        assert "November 15, 2013" in page            # Go "January 2, 2006" layout
        # Block-level accordion (serve.go:295-345): one <details> per
        # filter labelled "icon Name (block count)", bodies holding the
        # indexed post-filter block snapshots.
        assert page.count("<details>") == 12          # one per pipeline filter
        assert "✓" in page and "✗" in page
        assert "<p>0: " in page                       # indexed block cards

        try:
            urllib.request.urlopen(f"{base}/extract")
            raise AssertionError("missing url must 400")
        except urllib.error.HTTPError as exc:
            assert exc.code == 400

        try:
            urllib.request.urlopen(f"{base}/", data=b"x=1")
            raise AssertionError("POST must 405")
        except urllib.error.HTTPError as exc:
            assert exc.code == 405
    finally:
        ui.shutdown()
        src.shutdown()
