"""`mcp` — MCP stdio server for agent integration
(reference `src/cli/mcp.rs:296-319`)."""

from __future__ import annotations

from leann_tpu.server.mcp import McpServer


def add_parser(sub):
    p = sub.add_parser("mcp", help="Start MCP server (stdio)")
    p.add_argument("-i", "--index", default=None,
                   help="Default index name for the search tool")
    p.set_defaults(func=run)


def run(args) -> int:
    McpServer(default_index=args.index).run_stdio()
    return 0
