"""Scalar/list broadcast helper (reference: torch_geometric.utils.repeat,
imported by the vendored SplineConv at gmm_conv.py:7)."""

import itertools


def repeat(src, length: int):
    if src is None:
        return None
    if isinstance(src, (int, float)):
        return [src] * length
    src = list(src)
    if len(src) > length:
        return src[:length]
    if len(src) < length:
        return src + list(itertools.islice(
            itertools.cycle(src), length - len(src)))
    return src
