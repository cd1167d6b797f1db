from lavie_tpu.train.step import TrainState, diffusion_loss, make_train_step

__all__ = ["TrainState", "diffusion_loss", "make_train_step"]
