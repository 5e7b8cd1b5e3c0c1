"""Core containers: video formats, clip/frame pytrees, plane geometry."""
