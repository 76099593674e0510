"""Structured logging setup — parity with the reference's structlog
configuration (reference: src/logging_setup.py:1-37) using only the
stdlib: JSON lines by default (``LOG_FORMAT=json``), human console
format on ``LOG_FORMAT=console``, level from ``LOG_LEVEL``.

The reference emits ``{"timestamp": iso, "level": ..., "message": ...,
**context}`` via structlog's TimeStamper + add_log_level +
EventRenamer("message") + JSONRenderer; this formatter produces the
same shape so downstream log pipelines ingest either service
unchanged. Driver-side only — executor logs flow through log4j, which
is Spark's own domain."""

from __future__ import annotations

import datetime
import json
import logging
import os


class JsonFormatter(logging.Formatter):
    """One JSON object per line, reference key shape."""

    def format(self, record: logging.LogRecord) -> str:
        out = {
            "timestamp": datetime.datetime.fromtimestamp(
                record.created, tz=datetime.timezone.utc
            ).isoformat(),
            "level": record.levelname.lower(),
            "message": record.getMessage(),
            "logger": record.name,
        }
        extra = getattr(record, "context", None)
        if isinstance(extra, dict):
            out.update(extra)
        if record.exc_info:
            out["exception"] = self.formatException(record.exc_info)
        return json.dumps(out, default=str)


def configure_logging(level: str | None = None,
                      log_format: str | None = None) -> None:
    """Configure the root logger; env fallbacks use the reference's
    variable names (LOG_LEVEL, LOG_FORMAT)."""
    level = level or os.environ.get("LOG_LEVEL", "INFO")
    log_format = log_format or os.environ.get("LOG_FORMAT", "json")
    logging_level = getattr(logging, level.upper(), logging.INFO)

    handler = logging.StreamHandler()
    if log_format == "console":
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)-7s %(name)s %(message)s"))
    else:
        handler.setFormatter(JsonFormatter())

    root = logging.getLogger()
    root.handlers = [handler]
    root.setLevel(logging_level)


def get_logger(name: str | None = None) -> logging.LoggerAdapter:
    """Logger with a ``.bind(**ctx)``-style helper: pass ``context=``
    dicts through ``extra`` (the structlog contextvars analog)."""
    return logging.getLogger(name or "nats_stream_processor_spark")
