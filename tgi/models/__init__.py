from tgi.models.generator import (TriPlaneGenerator, GeneratorConfig,
                                  default_rendering_kwargs)
