"""CLI mirroring the reference's ``boilerpipe extract`` command
(cmd/boilerpipe/extract.go): local file, URL or stdin → JSON
{title, author, date, content} on stdout.  The argument dispatch follows
extract.go:48-79: no argument = stdin; an existing path = local file;
anything else = URL, fetched with a cookie-jar HTTP client
(extract.go:84-106; responses with status >= 400 are errors).  The serve
UI (A4) stays out of scope; ``--lineage`` exposes the LoggingPipeline
per-filter log the serve UI displayed.

Usage:
    python -m go_boilerpipe_ray extract [path_or_url]   # omitted = stdin
    python -m go_boilerpipe_ray extract --lineage f.html
    python -m go_boilerpipe_ray run <spans.parquet> <out_dir>  # Ray job
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _http_get(url: str) -> str:
    """Cookie-jar HTTP GET (extract.go:84-106): the jar carries cookies
    across redirects; status >= 400 is an error like the reference's
    check (urllib raises HTTPError for those — message kept in the same
    shape)."""
    import http.cookiejar
    import urllib.error
    import urllib.request

    jar = http.cookiejar.CookieJar()
    opener = urllib.request.build_opener(urllib.request.HTTPCookieProcessor(jar))
    try:
        with opener.open(url) as resp:
            charset = resp.headers.get_content_charset() or "utf-8"
            return resp.read().decode(charset, errors="replace")
    except urllib.error.HTTPError as exc:
        raise OSError(f"received HTTP response {exc.code} {exc.reason}") from exc
    except urllib.error.URLError as exc:
        raise OSError(f"{exc.reason}") from exc
    except ValueError as exc:  # not a URL at all (unknown url type)
        raise OSError(str(exc)) from exc


def _extract(args) -> int:
    from .kernel.document import parse_document
    from .kernel.filters import LoggingPipeline, article_pipeline
    from .kernel.normurl import parse as url_parse

    src_url = args.url
    if args.path:
        if os.path.exists(args.path):
            try:
                html = open(args.path, encoding="utf-8", errors="replace").read()
            except OSError as exc:
                print(f"error: {exc}", file=sys.stderr)
                return 1
        else:
            # Not a local file: treat as a URL (extract.go:64-78).
            try:
                html = _http_get(args.path)
            except OSError as exc:
                print(f"error getting document: {exc}", file=sys.stderr)
                return 1
            src_url = src_url or args.path
    else:
        html = sys.stdin.read()

    doc = parse_document(html)
    pipe = article_pipeline()
    if args.lineage:
        pipe = LoggingPipeline(pipe)
    pipe.process(doc)

    date = doc.date
    if src_url:
        u = url_parse(src_url)
        date = u.date() or date

    out = {
        "title": doc.title,
        "author": doc.author,
        "date": date.isoformat() if date else None,
        "content": doc.content(),
    }
    if args.lineage:
        out["lineage"] = [
            {"filter": f, "changed": c, "n_blocks": n} for f, c, n in pipe.log
        ]
    if args.html_view:
        from .kernel.document import string_to_html

        out["content_html"] = string_to_html(doc.content())
    json.dump(out, sys.stdout, ensure_ascii=False, indent=2 if args.indent else None)
    sys.stdout.write("\n")
    return 0


def _version(_args) -> int:
    """Mirror `boilerpipe version` (cmd/boilerpipe/main.go:89-100): the
    version plus platform triple, to stderr."""
    import platform

    from . import VERSION

    print(
        f"go_boilerpipe_ray {VERSION} "
        f"{platform.machine()}/{platform.system().lower()}/py{platform.python_version()}",
        file=sys.stderr,
    )
    return 0


_INDEX_HTML = """<!DOCTYPE html>
<html><head><title>boilerpipe</title></head><body>
<h1>boilerpipe</h1>
<form action="/extract" method="get">
  <input type="text" name="url" size="80" placeholder="http://...">
  <input type="submit" value="Extract">
</form>
</body></html>
"""

_ERROR_HTML = """<!DOCTYPE html>
<html><head><title>{status}</title></head><body>
<h1>{status}</h1><p>{error}</p>
</body></html>
"""


def _build_server(port: int):
    """HTTP extraction UI mirroring ``boilerpipe serve``
    (cmd/boilerpipe/serve.go:25-148): GET / renders the URL form, GET
    /extract?url=... fetches the page, runs the article pipeline under a
    logging wrapper, and renders title, date, the StringToHTML paragraph
    view of the content, and the per-filter change log.  Non-GET → 405;
    missing/unparseable url → 400; fetch/parse failure → 500 with an
    error page.  Request lines are logged to stderr like the
    reference's runHandler."""
    import datetime as _dt
    import html as _html
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, unquote, urlsplit

    from .kernel.document import parse_document, string_to_html
    from .kernel.filters import LoggingPipeline, article_pipeline
    from .kernel.normurl import parse as url_parse

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, body: str) -> None:
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _error(self, code: int, msg: str) -> int:
            from http.client import responses

            self._send(
                code,
                _ERROR_HTML.format(
                    status=responses.get(code, str(code)), error=_html.escape(msg)
                ),
            )
            return code

        def log_message(self, fmt, *largs):  # reference-shaped stderr log
            pass

        def _handle(self) -> int:
            parts = urlsplit(self.path)
            if parts.path == "/":
                self._send(200, _INDEX_HTML)
                return 200
            if parts.path != "/extract":
                return self._error(404, "not found")
            q = parse_qs(parts.query)
            rawurl = (q.get("url") or [""])[0]
            if not rawurl:
                return self._error(400, "Must specify url.")
            try:
                u = url_parse(rawurl)
            except Exception as exc:
                return self._error(400, str(exc))
            try:
                html_text = _http_get(rawurl)
            except OSError as exc:
                return self._error(500, str(exc))
            doc = parse_document(html_text)
            pipe = LoggingPipeline(article_pipeline(), snapshot_blocks=True)
            pipe.process(doc)
            date = u.date() or doc.date
            date_str = (
                f"{date:%B} {date.day}, {date.year}" if date else ""
            )  # Go layout "January 2, 2006"
            # Per-filter accordion mirroring serve.go's extract template
            # (serve.go:295-345): ✓/✗ = HasChanged, label = FilterName
            # (block count), body = one card per TextBlock as
            # "{index}: {text}" — the full block-level snapshot after
            # each filter, rendered with <details> instead of bootstrap.
            cards = []
            for (f, c, n), blocks in zip(pipe.log, pipe.block_snapshots):
                icon = "✓" if c else "✗"
                body_blocks = "".join(
                    f"<div class=\"card\"><p>{i}: {_html.escape(t)}</p></div>"
                    for i, t in enumerate(blocks)
                )
                cards.append(
                    f"<details><summary>{icon} {_html.escape(f)} ({n})"
                    f"</summary>{body_blocks}</details>"
                )
            body = (
                "<!DOCTYPE html><html><head><title>"
                f"{_html.escape(doc.title)}</title></head><body>"
                f"<h1>{_html.escape(doc.title)}</h1>"
                f"<p><em>{date_str}</em></p>"
                f"<div>{string_to_html(doc.content())}</div>"
                "<h2>Filter log</h2>"
                f"<div id=\"accordion\">{''.join(cards)}</div>"
                "</body></html>"
            )
            self._send(200, body)
            return 200

        def do_GET(self):
            code = self._handle()
            self._log_line(code)

        def do_POST(self):
            code = self._error(405, "method not supported")
            self._log_line(code)

        def _log_line(self, code: int) -> None:
            print(
                f"[{_dt.datetime.now()}] \"{self.command} "
                f"{unquote(self.path)} {self.request_version}\" {code}",
                file=sys.stderr,
            )

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def _serve(args) -> int:
    srv = _build_server(args.port)
    print(f"Listening on port {srv.server_address[1]}", file=sys.stderr)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def _run(args) -> int:
    """Resumable partitioned extraction job over a spans table — the
    ``ray job submit`` entry point shape."""
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    from .state.manifest import run_partitioned_extract

    manifest = run_partitioned_extract(
        args.input, args.output, num_partitions=args.partitions
    )
    done = len(manifest.completed)
    print(
        json.dumps(
            {
                "completed_partitions": done,
                "num_partitions": manifest.num_partitions,
                "metrics": {
                    "n_docs": sum(v.get("n_docs", 0) for v in manifest.completed.values()),
                    "n_errors": sum(
                        v.get("n_errors", 0) for v in manifest.completed.values()
                    ),
                },
            }
        )
    )
    ray.shutdown()
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(prog="go_boilerpipe_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="extract one HTML document to JSON")
    ex.add_argument("path", nargs="?", help="HTML file or URL (default: stdin)")
    ex.add_argument("--url", help="source URL (date derivation, like the CLI)")
    ex.add_argument("--indent", action="store_true")
    ex.add_argument("--lineage", action="store_true", help="per-filter change log")
    ex.add_argument(
        "--html-view",
        action="store_true",
        help="include the serve UI's paragraph-HTML debug view of content",
    )
    ex.set_defaults(fn=_extract)

    vs = sub.add_parser("version", help="print engine version")
    vs.set_defaults(fn=_version)

    sv = sub.add_parser("serve", help="HTTP extraction UI (reference serve)")
    sv.add_argument("--port", type=int, default=8080)
    sv.set_defaults(fn=_serve)

    rn = sub.add_parser("run", help="resumable Ray extraction job over a spans table")
    rn.add_argument("input", help="spans parquet path/dir")
    rn.add_argument("output", help="output directory (partitioned parquet)")
    rn.add_argument("--partitions", type=int, default=64)
    rn.set_defaults(fn=_run)

    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
