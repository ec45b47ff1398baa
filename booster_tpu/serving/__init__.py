"""Serving layer: generation engine, continuous-batching scheduler, HTTP API."""

from booster_tpu.serving.engine import Engine, GenerationResult

__all__ = ["Engine", "GenerationResult"]
