"""Code2Wav (models/code2wav.py) parity against the published torch
reference implementation (transformers Qwen3OmniMoeCode2Wav — the codec
family Qwen3-TTS's decoder belongs to). A tiny random torch model's state
dict is imported into our pytree and both decoders must produce the same
waveform. This is the strongest offline evidence that the JAX port IS the
real architecture (SURVEY.md §7 hard-part #1)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from qwen3_tts_tpu.models.code2wav import (  # noqa: E402
    Code2WavConfig,
    causal_conv,
    causal_tconv,
    code2wav_decode,
    init_code2wav,
    snake_beta,
)


def _tiny_cfgs():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (
        Qwen3OmniMoeCode2WavConfig,
    )

    hf = Qwen3OmniMoeCode2WavConfig(
        codebook_size=16,
        hidden_size=32,
        max_position_embeddings=128,
        rope_theta=10_000.0,
        num_attention_heads=4,
        num_key_value_heads=2,
        sliding_window=4,
        intermediate_size=64,
        num_hidden_layers=2,
        num_quantizers=3,
        upsample_rates=(3, 2),
        upsampling_ratios=(2,),
        decoder_dim=16,
        attn_implementation="eager",
    )
    ours = Code2WavConfig(
        codebook_size=16,
        num_quantizers=3,
        hidden=32,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        ffn=64,
        sliding_window=4,
        upsample_rates=(3, 2),
        upsampling_ratios=(2,),
        decoder_dim=16,
    )
    return hf, ours


def _torch_model(hf_cfg):
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (
        Qwen3OmniMoeCode2Wav,
    )

    torch.manual_seed(0)
    model = Qwen3OmniMoeCode2Wav(hf_cfg).eval().float()
    # non-trivial weights everywhere (post_init zeros some, e.g. snake
    # alphas stay zero — perturb so the parity test can't pass vacuously)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    return model


def _import_state_dict(sd, cfg: Code2WavConfig):
    """Map the torch module's state dict onto our pytree layout."""
    params = init_code2wav(cfg, seed=0)
    g = lambda name: np.asarray(sd[name].detach().numpy())  # noqa: E731

    params["code_emb"] = g("code_embedding.weight")

    def stack(fmt):
        return np.stack([g(fmt.format(i)) for i in range(cfg.n_layers)])

    blocks = params["pre"]["blocks"]
    pt = "pre_transformer.layers.{}."
    blocks["attn"]["q"]["w"] = stack(pt + "self_attn.q_proj.weight")
    blocks["attn"]["k"]["w"] = stack(pt + "self_attn.k_proj.weight")
    blocks["attn"]["v"]["w"] = stack(pt + "self_attn.v_proj.weight")
    blocks["attn"]["o"]["w"] = stack(pt + "self_attn.o_proj.weight")
    blocks["mlp"]["gate"]["w"] = stack(pt + "mlp.gate_proj.weight")
    blocks["mlp"]["up"]["w"] = stack(pt + "mlp.up_proj.weight")
    blocks["mlp"]["down"]["w"] = stack(pt + "mlp.down_proj.weight")
    blocks["ln1"] = stack(pt + "input_layernorm.weight")
    blocks["ln2"] = stack(pt + "post_attention_layernorm.weight")
    blocks["ls_attn"] = stack(pt + "self_attn_layer_scale.scale")
    blocks["ls_mlp"] = stack(pt + "mlp_layer_scale.scale")
    params["pre"]["ln_f"] = g("pre_transformer.norm.weight")

    ups = []
    for i in range(len(cfg.upsampling_ratios)):
        ups.append({
            "tconv": {"w": g(f"upsample.{i}.0.conv.weight"),
                      "b": g(f"upsample.{i}.0.conv.bias")},
            "cnx": {
                "dw": {"w": g(f"upsample.{i}.1.dwconv.conv.weight"),
                       "b": g(f"upsample.{i}.1.dwconv.conv.bias")},
                "ln_w": g(f"upsample.{i}.1.norm.weight"),
                "ln_b": g(f"upsample.{i}.1.norm.bias"),
                "pw1": {"w": g(f"upsample.{i}.1.pwconv1.weight"),
                        "b": g(f"upsample.{i}.1.pwconv1.bias")},
                "pw2": {"w": g(f"upsample.{i}.1.pwconv2.weight"),
                        "b": g(f"upsample.{i}.1.pwconv2.bias")},
                "gamma": g(f"upsample.{i}.1.gamma"),
            },
        })
    params["upsample"] = tuple(ups)

    dec = params["decoder"]
    dec["conv_in"] = {"w": g("decoder.0.conv.weight"),
                      "b": g("decoder.0.conv.bias")}
    blks = []
    for i in range(len(cfg.upsample_rates)):
        d = f"decoder.{1 + i}.block."
        blks.append({
            "snake": {"alpha": g(d + "0.alpha"), "beta": g(d + "0.beta")},
            "tconv": {"w": g(d + "1.conv.weight"), "b": g(d + "1.conv.bias")},
            "res": tuple(
                {
                    "a1": {"alpha": g(d + f"{2 + j}.act1.alpha"),
                           "beta": g(d + f"{2 + j}.act1.beta")},
                    "c1": {"w": g(d + f"{2 + j}.conv1.conv.weight"),
                           "b": g(d + f"{2 + j}.conv1.conv.bias")},
                    "a2": {"alpha": g(d + f"{2 + j}.act2.alpha"),
                           "beta": g(d + f"{2 + j}.act2.beta")},
                    "c2": {"w": g(d + f"{2 + j}.conv2.conv.weight"),
                           "b": g(d + f"{2 + j}.conv2.conv.bias")},
                }
                for j in range(3)
            ),
        })
    dec["blocks"] = tuple(blks)
    n = 1 + len(cfg.upsample_rates)
    dec["snake_out"] = {"alpha": g(f"decoder.{n}.alpha"),
                        "beta": g(f"decoder.{n}.beta")}
    dec["conv_out"] = {"w": g(f"decoder.{n + 1}.conv.weight"),
                       "b": g(f"decoder.{n + 1}.conv.bias")}
    return jax.tree.map(jnp.asarray, params)


def test_code2wav_matches_torch_reference():
    hf_cfg, cfg = _tiny_cfgs()
    model = _torch_model(hf_cfg)
    params = _import_state_dict(model.state_dict(), cfg)

    rng = np.random.default_rng(5)
    # T > sliding_window so the window mask semantics are actually pinned
    codes = rng.integers(0, cfg.codebook_size,
                         (2, cfg.num_quantizers, 12)).astype(np.int64)
    with torch.no_grad():
        wav_t = model(torch.tensor(codes)).numpy()[:, 0, :]
    wav_j = np.asarray(code2wav_decode(params, cfg, jnp.asarray(codes)))

    # the decoder's (k - stride) trims eat a constant edge: output length is
    # T * total_upsample - sum_i(r_i * prod(r_{j>i})) — both must agree
    assert wav_j.shape == wav_t.shape
    assert wav_j.shape[0] == 2
    assert wav_j.shape[1] <= 12 * cfg.total_upsample
    np.testing.assert_allclose(wav_t, wav_j, rtol=1e-4, atol=1e-5)


def test_code2wav_primitives_match_torch():
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 6, 37)).astype(np.float32)

    # snake beta
    alpha = rng.normal(0, 0.5, 6).astype(np.float32)
    beta = rng.normal(0, 0.5, 6).astype(np.float32)
    xt = torch.tensor(x)
    want = (xt + (1.0 / (torch.exp(torch.tensor(beta)).view(1, -1, 1) + 1e-9))
            * torch.sin(xt * torch.exp(torch.tensor(alpha)).view(1, -1, 1)) ** 2)
    got = snake_beta(jnp.asarray(x), {"alpha": alpha, "beta": beta})
    np.testing.assert_allclose(want.numpy(), np.asarray(got), rtol=1e-5)

    # dilated causal conv vs torch functional with the same explicit padding
    w = rng.normal(0, 0.3, (4, 6, 7)).astype(np.float32)
    b = rng.normal(0, 0.1, (4,)).astype(np.float32)
    pad = (7 - 1) * 3
    want = F.conv1d(F.pad(xt, (pad, 0)), torch.tensor(w), torch.tensor(b),
                    dilation=3).numpy()
    got = causal_conv(jnp.asarray(x), {"w": w, "b": b}, dilation=3)
    np.testing.assert_allclose(want, np.asarray(got), rtol=1e-4, atol=1e-6)

    # transposed conv with the (k - stride) symmetric trim
    wt = rng.normal(0, 0.3, (6, 3, 10)).astype(np.float32)
    bt = rng.normal(0, 0.1, (3,)).astype(np.float32)
    y = F.conv_transpose1d(xt, torch.tensor(wt), torch.tensor(bt), stride=5)
    want = y[..., 5:-5].numpy()
    got = causal_tconv(jnp.asarray(x), {"w": wt, "b": bt}, stride=5)
    np.testing.assert_allclose(want, np.asarray(got), rtol=1e-4, atol=1e-6)


def test_streaming_matches_one_shot():
    """Chunked streaming decode == one-shot decode, bit-identical, across
    mixed chunk sizes (the adaptive schedule hands off 2->3->4 frames)."""
    from qwen3_tts_tpu.models.code2wav import (
        code2wav_stream_step,
        stream_state_init,
    )

    _, cfg = _tiny_cfgs()
    params = jax.tree.map(jnp.asarray, init_code2wav(cfg, seed=9))
    rng = np.random.default_rng(2)
    T = 2 + 3 + 4
    codes = rng.integers(0, cfg.codebook_size,
                         (2, cfg.num_quantizers, T)).astype(np.int32)
    full = np.asarray(code2wav_decode(params, cfg, jnp.asarray(codes)))

    state = stream_state_init(params, cfg, batch=2)
    chunks = []
    t = 0
    for i, c in enumerate([2, 3, 4]):
        wav, state = code2wav_stream_step(
            params, cfg, state, jnp.asarray(codes[:, :, t : t + c]),
            pos=jnp.int32(t), first_chunk=(i == 0),
        )
        chunks.append(np.asarray(wav))
        t += c
    streamed = np.concatenate(chunks, axis=-1)

    assert streamed.shape == full.shape
    # overlap-add splits f32 summations differently -> reassociation noise
    # only (observed ~3e-9 absolute)
    np.testing.assert_allclose(streamed, full, rtol=1e-5, atol=1e-6)


def test_streaming_chunk_lengths():
    """Steady-state chunks emit exactly C*total_upsample samples; the first
    chunk is shorter by the summed left trims (static shapes per variant)."""
    from qwen3_tts_tpu.models.code2wav import (
        code2wav_stream_step,
        stream_state_init,
    )

    _, cfg = _tiny_cfgs()
    params = jax.tree.map(jnp.asarray, init_code2wav(cfg, seed=9))
    codes = jnp.zeros((1, cfg.num_quantizers, 4), jnp.int32)
    state = stream_state_init(params, cfg, batch=1)
    w1, state = code2wav_stream_step(params, cfg, state, codes, pos=0,
                                     first_chunk=True)
    w2, _ = code2wav_stream_step(params, cfg, state, codes, pos=4)
    # left-trim deficit: sum_i r_i * prod(rates after i) = 3*2 + 2 = 8
    assert w2.shape[-1] == 4 * cfg.total_upsample
    assert w1.shape[-1] == 4 * cfg.total_upsample - 8


def test_hf_checkpoint_import_reproduces_torch_decode(tmp_path):
    """End-to-end import fidelity: an HF snapshot carrying code2wav.* tensors
    (real transformers module paths) plus a code2wav_config section loads
    through import_hf_checkpoint, maps every codec tensor, and the imported
    JAX decoder reproduces the torch reference's waveform."""
    import json

    from safetensors.numpy import save_file

    from qwen3_tts_tpu.engine.weights import import_hf_checkpoint

    hf_cfg, cfg = _tiny_cfgs()
    model_t = _torch_model(hf_cfg)

    tensors = {
        f"code2wav.{k}": v.detach().numpy()
        for k, v in model_t.state_dict().items()
    }
    snap = tmp_path / "snapshot"
    snap.mkdir()
    save_file(tensors, str(snap / "model.safetensors"))
    config = {
        "talker_config": {
            "vocab_size": 256, "hidden_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "num_key_value_heads": 2,
            "head_dim": 16, "intermediate_size": 128,
            "codec_vocab_size": 67, "codec_bos_token_id": 64,
            "codec_eos_token_id": 65, "codec_pad_token_id": 66,
            "num_speakers": 4,
        },
        "code_predictor_config": {
            "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "head_dim": 16,
            "intermediate_size": 64,
        },
        "code2wav_config": {
            "codebook_size": 16, "num_quantizers": 3, "hidden_size": 32,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "intermediate_size": 64,
            "sliding_window": 4, "upsample_rates": [3, 2],
            "upsampling_ratios": [2], "decoder_dim": 16,
            "max_position_embeddings": 128,
        },
    }
    (snap / "config.json").write_text(json.dumps(config))

    with pytest.warns(UserWarning):  # talker/cp synthetic (allow_partial)
        model = import_hf_checkpoint(str(snap), allow_partial=True)
    assert model.cfg.codec_arch == "code2wav"
    assert model.cfg.code2wav.upsample_rates == (3, 2)
    assert model.cfg.codec.frame_rate == 24_000 / 12
    report = model.import_report
    assert report.assigned["codec"] == len(tensors)
    assert not [u for u in report.unmapped if u.startswith("code2wav")]

    rng = np.random.default_rng(7)
    codes = rng.integers(0, cfg.codebook_size,
                         (1, cfg.num_quantizers, 10)).astype(np.int64)
    with torch.no_grad():
        want = model_t(torch.tensor(codes)).numpy()[:, 0, :]
    got = np.asarray(
        code2wav_decode(
            jax.tree.map(jnp.asarray, model.codec_params["c2w"]),
            model.cfg.code2wav,
            jnp.asarray(codes),
        )
    )
    np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)


def test_flagship_code2wav_config():
    from qwen3_tts_tpu.engine import configs

    cfg = configs.flagship_code2wav("custom", frames_per_step=2)
    assert cfg.codec_arch == "code2wav"
    assert cfg.code2wav.total_upsample == 2000       # 12 Hz at 24 kHz
    assert cfg.codec.frame_rate == 12.0 and cfg.codec.hop == 2000
    assert cfg.codec.latent_dim == cfg.code2wav.hidden
    assert cfg.talker.frames_per_step == 2


def test_config_from_hf_dict():
    cfg = Code2WavConfig.from_hf_dict({
        "codebook_size": 2048,
        "num_quantizers": 16,
        "hidden_size": 1024,
        "num_hidden_layers": 8,
        "upsample_rates": [10, 5, 5, 4],
        "upsampling_ratios": [2],
        "decoder_dim": 1536,
    })
    # 10*5*5*4*2 = 2000 samples/frame -> exactly 12 Hz at 24 kHz
    assert cfg.total_upsample == 2000
    assert cfg.frame_rate == 12.0
