"""Structured Streaming operators (filled by streaming.windows /
streaming.stateful): tumbling/sliding/session windows with watermarks and
custom stateful sessionization."""
