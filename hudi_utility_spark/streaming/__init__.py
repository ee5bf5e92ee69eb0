"""Structured Streaming surface (SURVEY §2.9).

The reference's only stream is a control-plane status WebSocket; the data-
plane streaming operators here (tumbling/sliding/session windows,
watermarked dedup) are the north-star extension over the events table.
"""
