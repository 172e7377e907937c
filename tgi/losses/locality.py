"""PTI locality ("ball holder") regularizer.

Behavioral parity target: criteria/localitly_regulizer.py:9-60
(Space_Regulizer): sample z -> w, move the pivot latent toward each
sample by an alpha-normalized interpolation, and penalize L2 + LPIPS
between the original and tuned generators at those latents so tuning
stays local around the pivot.

Note: the reference calls ``G.synthesis(w)`` without a camera there —
incompatible with the EG3D signature and therefore dead unless
``use_locality_regularization`` is enabled (it defaults to False,
hyperparameters.py:9). This implementation fixes the call by rendering
under the provided camera, making the option actually usable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tgi.losses.basic import l2_loss


@dataclass(frozen=True)
class LocalityConfig:
    num_samples: int = 1          # latent_ball_num_of_samples
    alpha: float = 30.0           # regulizer_alpha
    l2_lambda: float = 0.1        # regulizer_l2_lambda
    lpips_lambda: float = 0.1     # regulizer_lpips_lambda


class SpaceRegularizer:
    def __init__(self, G, original_params, lpips_loss, camera,
                 cfg: LocalityConfig = LocalityConfig()):
        self.G = G
        self.original_params = original_params
        self.lpips = lpips_loss
        self.camera = camera
        self.cfg = cfg

    def _interpolated_ws(self, key, w_pivot, camera):
        """w_pivot + alpha-normalized directions to sampled ws
        (localitly_regulizer.py:15-22)."""
        cfg = self.cfg
        z = jax.random.normal(key, (cfg.num_samples, self.G.cfg.z_dim))
        cam = jnp.tile(camera, (cfg.num_samples, 1))
        w_samples = self.G.mapping(self.original_params, z, cam,
                                   truncation_psi=0.5)
        direction = w_samples - w_pivot
        norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
        return w_pivot + cfg.alpha * direction / (norm + 1e-8)

    def __call__(self, new_params, w_pivot, key, camera=None):
        """camera overrides the constructor default — PTICoach passes the
        per-image pivot camera so one regularizer serves every image."""
        cfg = self.cfg
        camera = self.camera if camera is None else camera
        ws = self._interpolated_ws(key, w_pivot, camera)
        loss = 0.0
        for i in range(cfg.num_samples):
            w = ws[i:i + 1]
            old = self.G.synthesis(self.original_params, w, camera,
                                   det=True)["image"]
            new = self.G.synthesis(new_params, w, camera,
                                   det=True)["image"]
            loss += l2_loss(old, new) * cfg.l2_lambda
            loss += self.lpips.from_unit(old, new).squeeze() \
                * cfg.lpips_lambda
        return loss / cfg.num_samples
