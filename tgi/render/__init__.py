from tgi.render.rays import ray_sampler, depth_to_world
from tgi.render.march import mip_ray_marcher
from tgi.render.maths import normalize_vecs, get_ray_limits_box, linspace_batch
from tgi.render.importance import (sample_stratified, sample_importance,
                                   sample_pdf, unify_samples)
from tgi.render.decoder import osg_decoder_init, osg_decoder_apply
from tgi.render.renderer import importance_render, run_model
