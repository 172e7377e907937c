"""Structural validation for converted torch checkpoints.

Every aux-model converter (pose ResNet, e4e, ArcFace, VGG/LPIPS) is a
structural rename of a torch state_dict into a tgi params pytree. A
checkpoint with the wrong layout (e.g. a full pSp dump fed where a bare
encoder state_dict is expected) used to mis-nest silently and fail deep
inside apply — or worse, behave like random init. ``validate_tree``
compares a converted tree against the expected pytree (keys AND leaf
shapes) and fails loudly with the exact diff.

The expected tree comes from the module's own ``init`` via
``jax.eval_shape`` (no FLOPs, no RAM).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def tree_spec(tree: Any, prefix: str = "") -> dict[str, tuple]:
    """Flatten a params pytree to {'a.b.c': shape}."""
    out: dict[str, tuple] = {}
    if isinstance(tree, dict):
        for k in tree:
            out.update(tree_spec(tree[k], f"{prefix}{k}."))
        return out
    shape = tuple(np.shape(tree)) if not hasattr(tree, "shape") \
        else tuple(tree.shape)
    out[prefix[:-1]] = shape
    return out


def expected_spec(init_fn, *args, **kwargs) -> dict[str, tuple]:
    """Shape-only evaluation of an init function (jax.eval_shape)."""
    shapes = jax.eval_shape(init_fn, *args, **kwargs)
    return tree_spec(shapes)


def validate_tree(got: Any, expected: dict[str, tuple] | Any,
                  name: str) -> Any:
    """Check ``got`` has exactly the keys+shapes of ``expected``.

    expected: either a spec dict from ``tree_spec``/``expected_spec`` or
    a pytree (converted internally). Returns ``got`` on success; raises
    ValueError listing missing / unexpected / shape-mismatched leaves.
    """
    if not isinstance(expected, dict) or any(
            isinstance(v, dict) for v in expected.values()):
        expected = tree_spec(expected)
    got_spec = tree_spec(got)
    missing = sorted(set(expected) - set(got_spec))
    extra = sorted(set(got_spec) - set(expected))
    bad = sorted(k for k in set(expected) & set(got_spec)
                 if tuple(expected[k]) != tuple(got_spec[k]))
    if not (missing or extra or bad):
        return got

    def head(items, fmt):
        lines = [fmt(k) for k in items[:8]]
        if len(items) > 8:
            lines.append(f"    ... and {len(items) - 8} more")
        return lines

    msg = [f"{name}: converted checkpoint does not match the expected "
           f"parameter layout ({len(expected)} leaves expected, "
           f"{len(got_spec)} converted):"]
    if missing:
        msg += [f"  missing {len(missing)} leaves:"] + head(
            missing, lambda k: f"    {k} {tuple(expected[k])}")
    if extra:
        msg += [f"  unexpected {len(extra)} leaves:"] + head(
            extra, lambda k: f"    {k} {tuple(got_spec[k])}")
    if bad:
        msg += [f"  shape mismatches ({len(bad)}):"] + head(
            bad, lambda k: f"    {k}: expected {tuple(expected[k])}, "
                           f"got {tuple(got_spec[k])}")
    msg.append("  (wrong checkpoint file for this flag? pSp/e4e dumps "
               "need the full ckpt with 'encoder.'-prefixed keys — see "
               "tgi.models.e4e.convert_psp_checkpoint)")
    raise ValueError("\n".join(msg))
