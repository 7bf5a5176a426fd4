from fithubert_tpu.train.losses import compute_losses, LossOutput
