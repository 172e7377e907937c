"""Stage-2 pivotal tuning: fine-tune the generator around the pivot.

Behavioral parity target: training/coaches/base_coach.py:96-126 +
single_id_coach.py:64-77. Loss = L2 + LPIPS on both the 512 image and the
128-resized raw render, plus depth total-variation, with LPIPS-based early
stopping at 0.06.

TPU-first: the loop is a bounded ``lax.while_loop`` over a jitted step —
the early-stop test runs on device (the reference pays a .item() sync per
step, single_id_coach.py:69). The whole stage is one XLA program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgi.losses.basic import l2_loss
from tgi.losses.warp import area_downsample


def compute_tv_norm(depth):
    """Squared-difference TV on [1, H, W] depth (base_coach.py:294-305)."""
    v00 = depth[:, :-1, :-1]
    v01 = depth[:, :-1, 1:]
    v10 = depth[:, 1:, :-1]
    return jnp.mean((v00 - v01) ** 2 + (v00 - v10) ** 2)


@dataclass(frozen=True)
class CoachConfig:
    max_pti_steps: int = 400
    pti_learning_rate: float = 3e-4
    pt_l2_lambda: float = 1.0
    pt_lpips_lambda: float = 1.0
    lpips_threshold: float = 0.06
    raw_resolution: int = 128
    # Rematerialize the synthesis pass in the loss (trades one extra
    # forward for activation memory — needed for batched tuning, where
    # B generator copies' 512^2 activations coexist).
    remat: bool = False
    # Max tuning steps per device dispatch. None = the whole stage is
    # one bounded lax.while_loop (default). The axon TPU relay kills the
    # worker on very long single executions (see
    # ProjectorConfig.dispatch_chunk); on-chip full-budget runs chunk
    # the loop into <=dispatch_chunk-iteration while_loops with the
    # limit threaded through the carry (ONE compiled program serves all
    # chunks; a stopped run exits each later chunk after one cond eval).
    dispatch_chunk: int | None = None


class PTICoach:
    """Per-image generator fine-tuning around a fixed (w, camera) pivot."""

    def __init__(self, G, lpips_loss, cfg: CoachConfig = CoachConfig(),
                 locality_regularizer: Callable | None = None):
        self.G = G
        self.lpips = lpips_loss
        self.cfg = cfg
        self.locality_regularizer = locality_regularizer
        self.opt = optax.adam(cfg.pti_learning_rate)

    def _loss(self, params, w_pivot, camera, real_images, key):
        cfg = self.cfg
        synth = lambda p, w, c, k: self.G.synthesis(
            p, w, c, noise_mode="const", det=False, key=k)
        if cfg.remat:
            synth = jax.checkpoint(synth)
        out = synth(params, w_pivot, camera, key)
        if real_images.shape[-1] > cfg.raw_resolution:
            real_raw = area_downsample(real_images, cfg.raw_resolution)
        elif real_images.shape[-1] < cfg.raw_resolution:
            n, ch = real_images.shape[:2]
            real_raw = jax.image.resize(
                real_images, (n, ch, cfg.raw_resolution, cfg.raw_resolution),
                method="linear")
        else:
            real_raw = real_images
        gen_raw = out["image_raw"]
        if gen_raw.shape[-1] != cfg.raw_resolution:
            n, c = gen_raw.shape[:2]
            gen_raw = jax.image.resize(
                gen_raw, (n, c, cfg.raw_resolution, cfg.raw_resolution),
                method="linear")

        loss = 0.0
        l2_val = l2_loss(out["image"], real_images) + \
            l2_loss(gen_raw, real_raw)
        loss += l2_val * cfg.pt_l2_lambda

        lp = (self.lpips.from_unit(out["image"], real_images)
              + self.lpips.from_unit(gen_raw, real_raw)).squeeze()
        loss += lp * cfg.pt_lpips_lambda

        if self.locality_regularizer is not None:
            loss += self.locality_regularizer(params, w_pivot, key,
                                              camera=camera)

        loss += compute_tv_norm(out["image_depth"][0])
        return loss, {"l2": l2_val, "lpips": lp}

    def tune(self, key, params, w_pivot, camera, real_images,
             max_steps=None, checkpoint_fn=None):
        """Run PTI; returns (tuned_params, metrics dict).

        real_images: [1, 3, R, R] in [-1, 1]. Early-stops on device when
        LPIPS <= threshold (checked BEFORE the update, matching
        single_id_coach.py:69-73).

        ``checkpoint_fn(step, params)``: host callback fired at each
        dispatch-chunk boundary (requires ``cfg.dispatch_chunk``; ignored
        under tune_batch's vmap). The compiled while programs are
        unchanged — the callback only reads the carry the chunked loop
        already syncs to host. Used by the self-inversion gate to trace
        reconstruction quality over the tuning run.
        """
        cfg = self.cfg
        max_steps = max_steps or cfg.max_pti_steps
        w_pivot = w_pivot[:, :self.G.cfg.num_ws, :]
        camera = camera[:, :25]
        grad_fn = jax.grad(self._loss, has_aux=True)
        opt_state = self.opt.init(params)

        def cond(carry):
            step, _, _, _, lp = carry
            return (step < max_steps) & (lp > cfg.lpips_threshold)

        def body(carry):
            step, params, opt_state, key, lp_prev = carry
            key, k = jax.random.split(key)
            grads, aux = grad_fn(params, w_pivot, camera, real_images, k)
            updates, new_opt = self.opt.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # The reference checks the threshold BEFORE stepping
            # (single_id_coach.py:69-73: break precedes optimizer.step),
            # so the update only lands when this step's LPIPS is above
            # it; `step` counts applied updates. `alive` (carried LPIPS
            # still above threshold) is vacuously true under the
            # sequential while_loop — its cond guarantees it — but makes
            # the body idempotent for stopped lanes, so ``tune_batch``'s
            # vmapped loop (which keeps running every lane until ALL
            # lanes finish) leaves finished images exactly frozen.
            alive = lp_prev > cfg.lpips_threshold
            go = alive & (aux["lpips"] > cfg.lpips_threshold)
            sel = lambda a, b: jnp.where(go, b, a)
            params = jax.tree_util.tree_map(sel, params, new_params)
            opt_state = jax.tree_util.tree_map(sel, opt_state, new_opt)
            lp = jnp.where(alive, aux["lpips"], lp_prev)
            return step + go.astype(jnp.int32), params, opt_state, key, lp

        carry = (jnp.asarray(0), params, opt_state, key, jnp.asarray(jnp.inf))
        chunk = cfg.dispatch_chunk
        if chunk is None:
            step, params, opt_state, key, lp = jax.lax.while_loop(
                cond, body, carry)
            return params, {"steps": step, "final_lpips": lp}

        # Chunked: same body, cond additionally bounded by a per-chunk
        # `limit` carried through the loop (a device scalar, so the one
        # compiled while program is reused for every chunk).
        def cond_c(c):
            step, _, _, _, lp, limit = c
            return (step < jnp.minimum(limit, max_steps)) & \
                (lp > cfg.lpips_threshold)

        def body_c(c):
            step, params, opt_state, key, lp, limit = c
            step, params, opt_state, key, lp = body(
                (step, params, opt_state, key, lp))
            return step, params, opt_state, key, lp, limit

        state = carry + (jnp.asarray(0, jnp.int32),)
        traced = isinstance(key, jax.core.Tracer)  # in tune_batch's vmap
        for end in range(chunk, max_steps + chunk, chunk):
            state = state[:5] + (jnp.asarray(end, jnp.int32),)
            state = jax.lax.while_loop(cond_c, body_c, state)
            if not traced:
                done = int(np.asarray(state[0]))  # host sync (see projector)
                if checkpoint_fn is not None:
                    checkpoint_fn(done, state[1])
        step, params, opt_state, key, lp = state[:5]
        return params, {"steps": step, "final_lpips": lp}

    def tune_batch(self, key, params, w_pivots, cameras, real_images,
                   max_steps=None):
        """Tune B per-image generator copies SIMULTANEOUSLY.

        A vmap of :meth:`tune` over (key, pivot, camera, target) with the
        shared starting ``params`` broadcast: per-image weights diverge
        from the first update, so the vmapped convs batch the B copies'
        matmuls on the MXU while keeping the reference's strictly
        per-image semantics (single_id_coach.py:40-77 runs images one at
        a time). Per-image early stop is exact — the loop body freezes a
        lane once its LPIPS crosses the threshold, so results match B
        sequential :meth:`tune` calls up to batched-matmul reassociation
        (~1e-7); wall-clock runs until the slowest image stops. Use
        ``CoachConfig(remat=True)`` when B copies' 512^2 activations
        exceed memory.

        Args:
            w_pivots: [B, 1, num_ws, D]; cameras: [B, 1, 25];
            real_images: [B, 1, 3, R, R].

        Returns (params pytree with leading B, {"steps": [B],
        "final_lpips": [B]}).
        """
        B = w_pivots.shape[0]
        keys = jax.random.split(key, B)
        return jax.vmap(
            lambda k, w, c, t: self.tune(k, params, w, c, t,
                                         max_steps=max_steps))(
            keys, w_pivots, cameras, real_images)
