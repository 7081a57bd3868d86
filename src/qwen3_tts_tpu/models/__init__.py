"""Neural model definitions: talker transformer, residual-codebook predictor,
and the 12 Hz neural codec (encoder/decoder). Pure-functional JAX over
parameter pytrees — no framework objects in the compute path."""
