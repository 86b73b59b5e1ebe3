"""CLI mirroring the reference's ``boilerpipe extract`` command
(cmd/boilerpipe/extract.go): local file or stdin → JSON
{title, author, date, content} on stdout.  HTTP fetching (A2) and the
serve UI (A4) are out of scope (SURVEY §7.5); ``--lineage`` exposes the
LoggingPipeline per-filter log the serve UI displayed.

Usage:
    python -m go_boilerpipe_ray extract [path]      # path omitted = stdin
    python -m go_boilerpipe_ray extract --lineage f.html
    python -m go_boilerpipe_ray run <spans.parquet> <out_dir>  # Ray job
"""

from __future__ import annotations

import argparse
import json
import sys


def _extract(args) -> int:
    from .kernel.document import parse_document
    from .kernel.filters import LoggingPipeline, article_pipeline
    from .kernel.normurl import parse as url_parse

    if args.path:
        try:
            html = open(args.path, encoding="utf-8", errors="replace").read()
        except OSError as exc:
            print(f"error: {exc}", file=sys.stderr)
            return 1
    else:
        html = sys.stdin.read()

    doc = parse_document(html)
    pipe = article_pipeline()
    if args.lineage:
        pipe = LoggingPipeline(pipe)
    pipe.process(doc)

    date = doc.date
    if args.url:
        u = url_parse(args.url)
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
    json.dump(out, sys.stdout, ensure_ascii=False, indent=2 if args.indent else None)
    sys.stdout.write("\n")
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
    ex.add_argument("path", nargs="?", help="HTML file (default: stdin)")
    ex.add_argument("--url", help="source URL (date derivation, like the CLI)")
    ex.add_argument("--indent", action="store_true")
    ex.add_argument("--lineage", action="store_true", help="per-filter change log")
    ex.set_defaults(fn=_extract)

    rn = sub.add_parser("run", help="resumable Ray extraction job over a spans table")
    rn.add_argument("input", help="spans parquet path/dir")
    rn.add_argument("output", help="output directory (partitioned parquet)")
    rn.add_argument("--partitions", type=int, default=64)
    rn.set_defaults(fn=_run)

    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
