"""EG3D GAN training: losses, phased updates, EMA — pjit-able.

Behavioral parity targets:
  StyleGAN2Loss (non-saturating + dual discrimination + density reg + R1,
  pose-conditioning swap, raw-blur fade, neural-res annealing)
                                    training/loss.py:28-292
  training_loop phase structure / lazy regularization / EMA
                                    training/training_loop.py:201-317

TPU-first: one jitted ``train_step`` executes Gmain (+lazy Greg), Dmain
(+lazy Dreg) and the EMA update back to back. Data parallelism comes from
sharding the batch along the mesh 'data' axis — XLA inserts the gradient
all-reduces (the reference's flat-tensor NCCL all_reduce,
training_loop.py:289-300, disappears into the compiled step).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgi.nn.discriminator import (DiscriminatorConfig,
                                  dual_discriminator_apply,
                                  discriminator_init, filtered_resizing)
from tgi.ops.upfirdn2d import filter2d


@dataclass(frozen=True)
class GANTrainConfig:
    batch_size: int = 4
    r1_gamma: float = 1.0
    g_lr: float = 0.0025
    d_lr: float = 0.002
    beta2: float = 0.99
    g_reg_interval: int = 4      # density regularization cadence
    d_reg_interval: int = 16     # R1 cadence
    ema_kimg: float = 10.0
    ema_rampup: float | None = 0.05
    style_mixing_prob: float = 0.0
    blur_init_sigma: float = 10.0
    blur_fade_kimg: float = 200.0
    gpc_reg_prob: float | None = 0.5
    gpc_reg_fade_kimg: float = 1000.0
    neural_rendering_resolution_initial: int = 64
    neural_rendering_resolution_final: int | None = None
    neural_rendering_resolution_fade_kimg: float = 1000.0
    density_reg_samples: int = 1000
    filter_mode: str = "antialiased"

    def lazy_adjusted(self, lr, interval):
        """Lazy-regularization lr/beta adjustment
        (training_loop.py:205-212)."""
        mb_ratio = interval / (interval + 1)
        return lr * mb_ratio, 0.0 ** mb_ratio, self.beta2 ** mb_ratio


def _blur(img, blur_sigma, blur_size: int):
    """Gaussian blur with traced sigma and static tap count
    (loss.py:74-77). ``blur_size`` is host-computed as floor(sigma*3) so
    the filter length stays static while the sigma value is traced —
    recompiles track the ~30 distinct sizes of the fade, not every step."""
    if blur_size <= 0:
        return img
    x = jnp.arange(-blur_size, blur_size + 1, dtype=jnp.float32)
    f = jnp.exp2(-jnp.square(x / jnp.maximum(blur_sigma, 1e-8)))
    return filter2d(img, f / f.sum())


class GANTrainer:
    """Pure-functional trainer: all state lives in the train_state pytree."""

    def __init__(self, G, d_cfg: DiscriminatorConfig,
                 cfg: GANTrainConfig = GANTrainConfig(), augment_fn=None):
        self.G = G
        self.d_cfg = d_cfg
        self.cfg = cfg
        self.augment_fn = augment_fn
        glr, gb1, gb2 = cfg.lazy_adjusted(cfg.g_lr, cfg.g_reg_interval)
        dlr, db1, db2 = cfg.lazy_adjusted(cfg.d_lr, cfg.d_reg_interval)
        self.g_opt = optax.adam(glr, b1=gb1, b2=gb2, eps=1e-8)
        self.d_opt = optax.adam(dlr, b1=db1, b2=db2, eps=1e-8)

    # -- schedules (host side; only neural_res/blur_size affect shapes) -----

    def _schedules(self, cur_nimg):
        cfg = self.cfg
        blur_sigma = (max(1 - cur_nimg / (cfg.blur_fade_kimg * 1e3), 0)
                      * cfg.blur_init_sigma if cfg.blur_fade_kimg > 0 else 0)
        alpha = (min(cur_nimg / (cfg.gpc_reg_fade_kimg * 1e3), 1)
                 if cfg.gpc_reg_fade_kimg > 0 else 1)
        swapping_prob = ((1 - alpha) * 1 + alpha * cfg.gpc_reg_prob
                         if cfg.gpc_reg_prob is not None else None)
        if cfg.neural_rendering_resolution_final is not None:
            a = min(cur_nimg / (cfg.neural_rendering_resolution_fade_kimg
                                * 1e3), 1)
            res = int(np.rint(cfg.neural_rendering_resolution_initial
                              * (1 - a)
                              + cfg.neural_rendering_resolution_final * a))
        else:
            res = cfg.neural_rendering_resolution_initial
        ema_nimg = cfg.ema_kimg * 1000
        if cfg.ema_rampup is not None:
            ema_nimg = min(ema_nimg, max(cur_nimg, 1) * cfg.ema_rampup)
        ema_beta = 0.5 ** (cfg.batch_size / max(ema_nimg, 1e-8))
        return blur_sigma, swapping_prob, res, ema_beta

    # -- G side -------------------------------------------------------------

    def _run_G(self, g_params, z, c, key, swapping_prob, neural_res):
        k_swap, k_render, k_mix, k_z2, k_cut = jax.random.split(key, 5)
        if swapping_prob is not None:
            c_swapped = jnp.roll(c, 1, axis=0)
            swap = jax.random.uniform(k_swap, (c.shape[0], 1)) < swapping_prob
            c_gen = jnp.where(swap, c_swapped, c)
        else:
            c_gen = jnp.zeros_like(c)
        ws = self.G.mapping(g_params, z, c_gen)
        if self.cfg.style_mixing_prob > 0:
            # loss.py:65-72: one batch-wide cutoff, mixed ws past it.
            num_ws = ws.shape[1]
            ws2 = self.G.mapping(g_params,
                                 jax.random.normal(k_z2, z.shape), c)
            cutoff = jax.random.randint(k_cut, (), 1, num_ws)
            cutoff = jnp.where(
                jax.random.uniform(k_mix) < self.cfg.style_mixing_prob,
                cutoff, num_ws)
            mixed = jnp.arange(num_ws)[None, :, None] >= cutoff
            ws = jnp.where(mixed, ws2, ws)
        out = self.G.synthesis(g_params, ws, c,
                               neural_rendering_resolution=neural_res,
                               noise_mode="random", det=False, key=k_render)
        return out, ws

    def _run_D(self, d_params, img, img_raw, c, key, blur_sigma, blur_size,
               ada_p):
        img = _blur(img, blur_sigma, blur_size)
        if self.augment_fn is not None:
            img, img_raw = self.augment_fn(img, img_raw, key, ada_p)
        return dual_discriminator_apply(d_params, img, img_raw, c, self.d_cfg,
                                        filter_mode=self.cfg.filter_mode)

    def gmain_loss(self, g_params, d_params, z, c, key, blur_sigma,
                   blur_size, swapping_prob, neural_res, ada_p):
        k_g, k_d = jax.random.split(key)
        out, _ = self._run_G(g_params, z, c, k_g, swapping_prob, neural_res)
        logits = self._run_D(d_params, out["image"], out["image_raw"], c,
                             k_d, blur_sigma, blur_size, ada_p)
        return jax.nn.softplus(-logits).mean()

    def greg_loss(self, g_params, z, c, key, swapping_prob):
        """Density regularization, reg_type-dispatch (loss.py:131-240)."""
        rk = self.G.cfg.rendering_kwargs
        reg_type = rk.get("reg_type", "l1")
        k_swap, k_coord, k_perturb = jax.random.split(key, 3)
        if swapping_prob is not None:
            c_swapped = jnp.roll(c, 1, axis=0)
            swap = jax.random.uniform(k_swap, ()) < swapping_prob
            c_gen = jnp.where(swap, c_swapped, c)
        else:
            c_gen = jnp.zeros_like(c)
        ws = self.G.mapping(g_params, z, c_gen)
        n = self.cfg.density_reg_samples
        loss = 0.0
        if reg_type in ("monotonic-detach", "monotonic-fixed"):
            pts = jax.random.uniform(k_coord, (ws.shape[0], 2 * n, 3),
                                     minval=-1, maxval=1)[:, :n]
            behind = pts + jnp.asarray([0, 0, -1.0]) / 256 * rk["box_warp"]
            allpts = jnp.concatenate([pts, behind], axis=1)
            sigma = self.G.sample_mixed(g_params, allpts, ws)["sigma"]
            s0, s1 = sigma[:, :n], sigma[:, n:]
            if reg_type == "monotonic-detach":
                s0 = jax.lax.stop_gradient(s0)
            loss += jax.nn.relu(s0 - s1).mean() * 10
            perturb_scale = (1 / 256) * rk["box_warp"]
        else:
            perturb_scale = rk["density_reg_p_dist"]
        pts = jax.random.uniform(k_coord, (ws.shape[0], n, 3),
                                 minval=-1, maxval=1)
        perturbed = pts + jax.random.normal(k_perturb, pts.shape) \
            * perturb_scale
        allpts = jnp.concatenate([pts, perturbed], axis=1)
        sigma = self.G.sample_mixed(g_params, allpts, ws)["sigma"]
        loss += jnp.abs(sigma[:, :n] - sigma[:, n:]).mean() \
            * rk.get("density_reg", 0)
        return loss

    # -- D side -------------------------------------------------------------

    def dmain_loss(self, d_params, g_params, z, c, real_img, real_raw, key,
                   blur_sigma, blur_size, swapping_prob, neural_res, ada_p):
        k_g, k_d1, k_d2 = jax.random.split(key, 3)
        out, _ = self._run_G(g_params, z, c, k_g, swapping_prob, neural_res)
        gen_logits = self._run_D(
            d_params, jax.lax.stop_gradient(out["image"]),
            jax.lax.stop_gradient(out["image_raw"]), c, k_d1, blur_sigma,
            blur_size, ada_p)
        real_logits = self._run_D(d_params, real_img, real_raw, c, k_d2,
                                  blur_sigma, blur_size, ada_p)
        loss = (jax.nn.softplus(gen_logits).mean()
                + jax.nn.softplus(-real_logits).mean())
        # Loss/signs/real (loss.py:75) — the ADA controller's input.
        return loss, jnp.sign(real_logits).mean()

    def dreg_loss(self, d_params, real_img, real_raw, c, key, blur_sigma,
                  blur_size, ada_p):
        """R1 penalty on image + raw (loss.py:268-283); jax.grad replaces
        the create_graph double-backward machinery."""
        def logits_sum(img, raw):
            return self._run_D(d_params, img, raw, c, key, blur_sigma,
                               blur_size, ada_p).sum()

        g_img, g_raw = jax.grad(logits_sum, argnums=(0, 1))(real_img,
                                                            real_raw)
        r1 = (jnp.sum(jnp.square(g_img), axis=(1, 2, 3))
              + jnp.sum(jnp.square(g_raw), axis=(1, 2, 3)))
        return (r1 * (self.cfg.r1_gamma / 2)).mean()

    # -- the step -----------------------------------------------------------

    def train_step(self, state, z, c, real_img, key, cur_nimg: int,
                   do_greg: bool, do_dreg: bool, ada_p: float = 0.0):
        """One full G+D update. Schedule values (blur sigma, swap prob,
        EMA beta, ADA p) are traced scalars so the step compiles once per
        (neural_res, blur_size) — the reference recomputes them per step on
        host (training_loop.py:280-300); only shape-affecting quantities
        stay static here."""
        blur_sigma, swapping_prob, neural_res, ema_beta = \
            self._schedules(cur_nimg)
        blur_size = int(np.floor(blur_sigma * 3))
        sp = (None if swapping_prob is None
              else jnp.float32(swapping_prob))
        return self._step(state, z, c, real_img, key,
                          jnp.float32(blur_sigma), sp,
                          jnp.float32(ema_beta), jnp.float32(ada_p),
                          blur_size=blur_size, neural_res=neural_res,
                          do_greg=do_greg, do_dreg=do_dreg)

    @partial(jax.jit, static_argnames=("self", "do_greg", "do_dreg",
                                       "neural_res", "blur_size"))
    def _step(self, state, z, c, real_img, key, blur_sigma, swapping_prob,
              ema_beta, ada_p, *, blur_size: int, neural_res: int,
              do_greg: bool, do_dreg: bool):
        cfg = self.cfg
        k_g, k_greg, k_d, k_dreg = jax.random.split(key, 4)

        real_raw = filtered_resizing(real_img, neural_res, cfg.filter_mode)
        real_raw = _blur(real_raw, blur_sigma, blur_size)

        # G phase (+ lazy Greg at gain = g_reg_interval, loss.py:152,
        # training_loop.py:284).
        g_loss, g_grads = jax.value_and_grad(self.gmain_loss)(
            state["g_params"], state["d_params"], z, c, k_g, blur_sigma,
            blur_size, swapping_prob, neural_res, ada_p)
        metrics = {"g_loss": g_loss}
        if do_greg:
            greg, greg_grads = jax.value_and_grad(self.greg_loss)(
                state["g_params"], z, c, k_greg, swapping_prob)
            gain = float(cfg.g_reg_interval)
            g_grads = jax.tree_util.tree_map(
                lambda a, b: a + gain * b, g_grads, greg_grads)
            metrics["g_reg"] = greg
        g_updates, g_opt_state = self.g_opt.update(
            _sanitize(g_grads), state["g_opt"], state["g_params"])
        g_params = optax.apply_updates(state["g_params"], g_updates)

        # D phase (+ lazy Dr1 at gain = d_reg_interval, loss.py:290).
        (d_loss, signs_real), d_grads = jax.value_and_grad(
            self.dmain_loss, has_aux=True)(
            state["d_params"], g_params, z, c, real_img, real_raw, k_d,
            blur_sigma, blur_size, swapping_prob, neural_res, ada_p)
        metrics["d_loss"] = d_loss
        metrics["signs_real"] = signs_real
        if do_dreg:
            dreg, dreg_grads = jax.value_and_grad(self.dreg_loss)(
                state["d_params"], real_img, real_raw, c, k_dreg,
                blur_sigma, blur_size, ada_p)
            gain = float(cfg.d_reg_interval)
            d_grads = jax.tree_util.tree_map(
                lambda a, b: a + gain * b, d_grads, dreg_grads)
            metrics["d_reg"] = dreg
        d_updates, d_opt_state = self.d_opt.update(
            _sanitize(d_grads), state["d_opt"], state["d_params"])
        d_params = optax.apply_updates(state["d_params"], d_updates)

        # EMA (training_loop.py:307-317), beta traced.
        g_ema = jax.tree_util.tree_map(
            lambda e, p: p + (e - p) * ema_beta, state["g_ema"], g_params)

        new_state = {"g_params": g_params, "d_params": d_params,
                     "g_ema": g_ema, "g_opt": g_opt_state,
                     "d_opt": d_opt_state}
        return new_state, metrics


def _sanitize(grads):
    """nan_to_num on gradients (training_loop.py:296)."""
    return jax.tree_util.tree_map(
        lambda g: jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5), grads)


def init_train_state(key, G, d_cfg: DiscriminatorConfig, trainer: GANTrainer):
    kg, kd = jax.random.split(key)
    g_params = G.init(kg)
    d_params = discriminator_init(kd, d_cfg)
    return {
        "g_params": g_params,
        "d_params": d_params,
        "g_ema": jax.tree_util.tree_map(jnp.copy, g_params),
        "g_opt": trainer.g_opt.init(g_params),
        "d_opt": trainer.d_opt.init(d_params),
    }
