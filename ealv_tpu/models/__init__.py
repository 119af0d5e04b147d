from .cvae import CVAE, ModelState, conv_output_dims
from .losses import gaussian_nll, kl_divergence, cvae_loss
