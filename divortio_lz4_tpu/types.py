"""Batteries-included type helpers: strings and JSON objects.

Parity with /root/reference/src/shared/typeHandling.js:26-81.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from .config import DEFAULT_CONFIG, FrameConfig
from .frame import compress_frame, decompress_frame


def compress_string(text: str, dictionary=None,
                    config: FrameConfig = DEFAULT_CONFIG, **kw):
    """UTF-8 encode *text* and compress it into an LZ4 frame."""
    return compress_frame(text.encode("utf-8"), dictionary, config, **kw)


def decompress_string(data, dictionary=None, verify_checksum: bool = True,
                      **kw) -> str:
    """Decompress an LZ4 frame and decode it as UTF-8."""
    return bytes(decompress_frame(data, dictionary, verify_checksum, **kw)
                 ).decode("utf-8")


def compress_object(obj: Any, dictionary=None,
                    config: FrameConfig = DEFAULT_CONFIG, **kw):
    """JSON-serialize *obj* and compress it into an LZ4 frame."""
    try:
        text = json.dumps(obj)
    except (TypeError, ValueError) as e:
        raise ValueError(f"LZ4: Input cannot be serialized to JSON ({e})")
    return compress_frame(text.encode("utf-8"), dictionary, config, **kw)


def decompress_object(data, dictionary=None, verify_checksum: bool = True,
                      **kw) -> Any:
    """Decompress an LZ4 frame and parse it as JSON."""
    return json.loads(bytes(
        decompress_frame(data, dictionary, verify_checksum, **kw)))
