"""Symbolic shape assertions at module boundaries.

Behavioral parity target: torch_utils/misc.py:84-101 (assert_shape) —
the reference sprinkles these at nearly every layer boundary so shape
bugs fail with named errors instead of deep kernel messages.
"""

from __future__ import annotations


def assert_shape(x, ref, name: str = "tensor"):
    """ref: sequence of ints or None (wildcard). Raises AssertionError
    with a readable message on mismatch."""
    shape = tuple(x.shape)
    if len(shape) != len(ref):
        raise AssertionError(
            f"{name}: wrong rank {len(shape)} (shape {shape}), "
            f"expected {len(ref)} ({tuple(ref)})")
    for i, (got, want) in enumerate(zip(shape, ref)):
        if want is not None and got != want:
            raise AssertionError(
                f"{name}: dim {i} is {got}, expected {want} "
                f"(shape {shape} vs {tuple(ref)})")
