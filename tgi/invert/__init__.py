from tgi.invert.projector import ProjectorConfig, Projector
from tgi.invert.coach import CoachConfig, PTICoach
