"""Uniform malformed-input guard for the pure-Python codec kits.

A web-scale fetch-and-extract stage feeds downloaded bytes straight into
these decoders; arbitrary truncation or corruption must surface as a clean
``ValueError`` (the decode dispatchers' "this payload is bad" signal —
operators/multimodal.py, operators/imagedup.py), never as a raw
``IndexError``/``struct.error``/``KeyError`` that would kill the Spark task
and with it the whole stage. The kits validate container structure
explicitly (RIFF/box sizes, trailers, EOI markers); this decorator is the
belt-and-braces boundary for every parse path those checks can't enumerate.

``AssertionError`` is deliberately NOT converted: the kits use assertions
for unsupported-shape declarations (e.g. interlaced GIF), which the extract
stages classify separately from malformed bytes.
"""

from __future__ import annotations

import functools
import struct
import zlib

_MALFORMED = (
    IndexError,
    KeyError,
    StopIteration,
    TypeError,
    OverflowError,
    struct.error,
    zlib.error,
)


def rejects_malformed(name: str):
    """Decorator: any low-level parse error inside ``fn`` becomes
    ``ValueError(f"{name}: malformed or truncated stream (...)")``."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except ValueError:
                raise
            except _MALFORMED as e:
                raise ValueError(
                    f"{name}: malformed or truncated stream "
                    f"({type(e).__name__})"
                ) from e

        return wrapper

    return deco
