from tgi.invert.projector import ProjectorConfig, Projector
from tgi.invert.coach import CoachConfig, PTICoach
from tgi.invert.selfinv import (self_inversion_eval,
                                self_inversion_eval_batch,
                                rotation_error_deg, aim_pose_net)
