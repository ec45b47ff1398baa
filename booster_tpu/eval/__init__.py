"""Evaluation utilities (perplexity — the reference's unchecked roadmap item,
/root/reference/roadmap.md:44)."""

from booster_tpu.eval.perplexity import perplexity

__all__ = ["perplexity"]
