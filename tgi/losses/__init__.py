from tgi.losses.basic import l2_loss, depth_tv_loss, noise_regularization
from tgi.losses.warp import calc_warping_loss
from tgi.losses.lpips import LPIPSLoss
from tgi.losses.id_loss import id_loss
from tgi.losses.clip_loss import clip_loss
