"""Inference runtime: KV caches, on-device sampling, jitted prefill/decode
loops, prompt construction, streaming synthesis and batched serving."""
