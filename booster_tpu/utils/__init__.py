"""Shared utilities: structured logging, logo, timing helpers."""

from booster_tpu.utils.logging import setup_logging

__all__ = ["setup_logging"]
