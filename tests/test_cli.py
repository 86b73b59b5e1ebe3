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
    p = _run(["extract", "/nonexistent.html"])
    assert p.returncode == 1
    assert p.stderr.startswith("error:")
