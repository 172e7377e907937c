from tgi.train.gan import (GANTrainConfig, GANTrainer, init_train_state)
