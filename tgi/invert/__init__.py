from tgi.invert.projector import ProjectorConfig, Projector
from tgi.invert.coach import CoachConfig, PTICoach
from tgi.invert.selfinv import self_inversion_eval, rotation_error_deg
