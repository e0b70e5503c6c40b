"""Shared utilities: timing, logging."""

from flash_attention_cute_tpu.utils.timing import (  # noqa: F401
    time_chained,
    time_fn,
)
