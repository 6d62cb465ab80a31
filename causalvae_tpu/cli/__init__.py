"""causalvae_tpu subpackage."""
