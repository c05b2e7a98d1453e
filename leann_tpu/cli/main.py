"""CLI entry point: `leann-tpu` / `python -m leann_tpu`.

Subcommand set mirrors the reference (`src/cli/mod.rs:49-84`): build,
update, search, ask, react, serve, list, remove, prune, config, mcp —
plus global -v/--verbose and -q/--quiet.
"""

from __future__ import annotations

import argparse

import sys
from typing import List, Optional

from leann_tpu.version import __version__


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="leann-tpu",
        description="LEANN-TPU — TPU-native vector database for RAG",
    )
    parser.add_argument("--version", action="version",
                        version=f"leann-tpu {__version__}")
    parser.add_argument("-v", "--verbose", action="store_true",
                        help="Enable verbose output")
    parser.add_argument("-q", "--quiet", action="store_true",
                        help="Suppress non-essential output")
    sub = parser.add_subparsers(dest="command", required=True)

    from leann_tpu.cli import (
        ask_cmd,
        build_cmd,
        config_cmd,
        list_cmd,
        mcp_cmd,
        prune_cmd,
        react_cmd,
        reindex_cmd,
        remove_cmd,
        search_cmd,
        serve_cmd,
        update_cmd,
    )

    for mod in (
        build_cmd, update_cmd, reindex_cmd, search_cmd, ask_cmd, react_cmd,
        serve_cmd, list_cmd, remove_cmd, prune_cmd, config_cmd, mcp_cmd,
    ):
        mod.add_parser(sub)
    return parser


def main(argv: Optional[List[str]] = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    from leann_tpu.utils import configure_logging

    configure_logging(verbose=args.verbose, quiet=args.quiet)
    try:
        return args.func(args)
    except KeyboardInterrupt:
        print("\nInterrupted.", file=sys.stderr)
        return 130
    except BrokenPipeError:
        # stdout consumer (e.g. `| head`) closed early: exit quietly
        try:
            sys.stdout.close()
        except Exception:
            pass
        return 0


if __name__ == "__main__":
    sys.exit(main())
