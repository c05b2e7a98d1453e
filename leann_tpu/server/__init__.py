"""Serving surfaces: HTTP API + MCP stdio server."""
