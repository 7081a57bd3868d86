"""Checkpoint loading and saving.

Two on-disk formats are supported:

1. **Native format** (written by ``save_model``): a directory holding
   ``tts_config.json`` (the full ModelConfig) plus one ``.safetensors`` file
   per component (talker / code_predictor / codec) with flat ``/``-joined
   pytree paths as tensor names. Loading is an exact round trip.

2. **HF/MLX import** (the mlx-community snapshots the reference downloads,
   reference config.py:14-42, io.py:55-92): ``config.json`` +
   ``model*.safetensors`` with Qwen-style parameter names, optionally
   MLX-quantized (uint32-packed codes + per-group ``scales``/``biases`` —
   unpacked by ``ops.quant.unpack_mlx_uint32`` into our uint8 layout, which
   dequantizes identically, see ops/quant.py). Imported checkpoints are
   converted once and cached in native format under ``_tpu_native/`` inside
   the model directory (SURVEY.md §5 checkpoint/resume: "weight-conversion
   step ... cached after first conversion").

Import is *component-tolerant*: any component whose tensors are absent falls
back to synthetic init with a warning, so a talker-only checkpoint still
produces a runnable model. Unmapped tensor names are collected and reported
rather than silently dropped.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import warnings
from typing import Any

import numpy as np

from ..engine import configs
from ..engine.configs import (
    CodecConfig,
    CodePredictorConfig,
    ModelConfig,
    QuantConfig,
    TalkerConfig,
)
from ..ops.quant import unpack_mlx_uint32

NATIVE_DIR = "_tpu_native"
NATIVE_CONFIG = "tts_config.json"
_COMPONENTS = ("talker", "code_predictor", "codec")


# --------------------------------------------------------------------------
# pytree <-> flat dict
# --------------------------------------------------------------------------

def flatten_tree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    """Flatten a nested dict/list pytree of arrays into {path: array}."""
    out: dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict[str, np.ndarray]) -> Any:
    """Inverse of ``flatten_tree``. Integer path segments become lists."""
    root: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def materialise(node: Any) -> Any:
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(re.fullmatch(r"\d+", k) for k in keys):
            return [materialise(node[str(i)]) for i in range(len(keys))]
        return {k: materialise(v) for k, v in node.items()}

    return materialise(root)


# --------------------------------------------------------------------------
# config (de)serialisation
# --------------------------------------------------------------------------

def config_to_dict(cfg: ModelConfig) -> dict:
    return dataclasses.asdict(cfg)


def config_from_dict(d: dict) -> ModelConfig:
    def build(cls, sub):
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in sub.items() if k in fields}
        for k, v in kw.items():
            if isinstance(v, list):
                kw[k] = tuple(v)
        return cls(**kw)

    return ModelConfig(
        mode=d.get("mode", "custom"),
        talker=build(TalkerConfig, d.get("talker", {})),
        code_predictor=build(CodePredictorConfig, d.get("code_predictor", {})),
        codec=build(CodecConfig, d.get("codec", {})),
        quant=build(QuantConfig, d.get("quant", {})),
        dtype=d.get("dtype", "bfloat16"),
        max_seq_len=d.get("max_seq_len", 3072),
        speakers=tuple(d.get("speakers", ModelConfig().speakers)),
    )


# --------------------------------------------------------------------------
# native format
# --------------------------------------------------------------------------

def save_model(model, path: str) -> None:
    """Write a loaded model to ``path`` in native format."""
    from safetensors.numpy import save_file

    import jax

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, NATIVE_CONFIG), "w") as f:
        json.dump(config_to_dict(model.cfg), f, indent=2)

    trees = {
        "talker": model.params,
        "code_predictor": model.cp_params,
        "codec": model.codec_params,
    }
    for comp, tree in trees.items():
        host = jax.tree.map(np.asarray, tree)
        flat = flatten_tree(host)
        out: dict[str, np.ndarray] = {}
        for name, arr in flat.items():
            if arr.dtype == np.dtype("bfloat16") or str(arr.dtype) == "bfloat16":
                out[f"{name}::bf16"] = arr.view(np.uint16)
            else:
                out[name] = np.ascontiguousarray(arr)
        save_file(out, os.path.join(path, f"{comp}.safetensors"))


def _load_component(path: str, comp: str) -> Any:
    import jax.numpy as jnp

    from safetensors.numpy import load_file

    raw = load_file(os.path.join(path, f"{comp}.safetensors"))
    flat: dict[str, np.ndarray] = {}
    for name, arr in raw.items():
        if name.endswith("::bf16"):
            flat[name[: -len("::bf16")]] = arr.view(jnp.bfloat16)
        else:
            flat[name] = arr
    return unflatten_tree(flat)


def is_native_dir(path: str) -> bool:
    return os.path.exists(os.path.join(path, NATIVE_CONFIG))


def load_native(path: str, **kwargs):
    """Load a native-format checkpoint directory -> Qwen3TTSModel."""
    from .api import Qwen3TTSModel
    from .tokenizer import load_tokenizer

    with open(os.path.join(path, NATIVE_CONFIG)) as f:
        cfg = config_from_dict(json.load(f))
    # host trees: api.apply_compute_format converts + places on device
    trees = {c: _load_component(path, c) for c in _COMPONENTS}
    return Qwen3TTSModel(
        cfg=cfg,
        params=trees["talker"],
        cp_params=trees["code_predictor"],
        codec_params=trees["codec"],
        tokenizer=load_tokenizer(path, cfg.talker.vocab_size),
        name=os.path.basename(os.path.normpath(path)),
    )


# --------------------------------------------------------------------------
# HF / MLX import
# --------------------------------------------------------------------------

def _read_hf_config(path: str) -> dict:
    p = os.path.join(path, "config.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _config_from_hf(hf: dict, mode: str) -> ModelConfig:
    """Best-effort ModelConfig from an HF config.json; unknown fields keep
    flagship defaults (engine/configs.py)."""
    base = configs.flagship(mode)
    talker_cfg = hf.get("talker_config", hf.get("text_config", hf))
    t = base.talker
    talker = dataclasses.replace(
        t,
        vocab_size=talker_cfg.get("vocab_size", t.vocab_size),
        hidden=talker_cfg.get("hidden_size", t.hidden),
        n_layers=talker_cfg.get("num_hidden_layers", t.n_layers),
        n_heads=talker_cfg.get("num_attention_heads", t.n_heads),
        n_kv_heads=talker_cfg.get("num_key_value_heads", t.n_kv_heads),
        head_dim=talker_cfg.get("head_dim", t.head_dim),
        ffn=talker_cfg.get("intermediate_size", t.ffn),
        rope_theta=talker_cfg.get("rope_theta", t.rope_theta),
        rms_eps=talker_cfg.get("rms_norm_eps", t.rms_eps),
    )
    quant = base.quant
    qcfg = hf.get("quantization", hf.get("quantization_config"))
    if isinstance(qcfg, dict):
        quant = QuantConfig(
            bits=qcfg.get("bits", 8),
            group_size=qcfg.get("group_size", 64),
            enabled=True,
        )
    # real Qwen3-TTS checkpoints honor the speed control tag natively, so
    # the engine's WSOLA fallback (engine/api.py) must not double-apply
    return dataclasses.replace(
        base, talker=talker, quant=quant, native_speed=True
    )


# Qwen-style per-layer linear bases -> our stacked-block pytree paths.
_BLOCK_LINEARS = {
    "self_attn.q_proj": "attn/q",
    "self_attn.k_proj": "attn/k",
    "self_attn.v_proj": "attn/v",
    "self_attn.o_proj": "attn/o",
    "mlp.gate_proj": "mlp/gate",
    "mlp.up_proj": "mlp/up",
    "mlp.down_proj": "mlp/down",
}
# Qwen-style per-layer norm tensors (exact names) -> stacked-block paths.
_BLOCK_NORMS = {
    "self_attn.q_norm.weight": "attn/q_norm",
    "self_attn.k_norm.weight": "attn/k_norm",
    "input_layernorm.weight": "ln1",
    "post_attention_layernorm.weight": "ln2",
}
_TALKER_TOP_MAP = {
    "model.embed_tokens.weight": "text_emb",
    "embed_tokens.weight": "text_emb",
    "model.codec_embed_tokens.weight": "codec_emb",
    "codec_embed_tokens.weight": "codec_emb",
    "codec_embedding.weight": "codec_emb",
    "model.norm.weight": "ln_f",
    "norm.weight": "ln_f",
    "lm_head": "head",
    "codec_head": "head",
    "speaker_embedding.weight": "spk_emb",
    "spk_embed.weight": "spk_emb",
}
_LAYER_RE = re.compile(r"^(?:model\.)?layers\.(\d+)\.(.+)$")


def _collect_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    tensors: dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors"):
            tensors.update(load_file(os.path.join(path, fname)))
    return tensors


def _strip_prefix(name: str) -> tuple[str, str]:
    """Return (component, remainder). Components: talker / codec / cp."""
    for pref, comp in (
        ("code_predictor.", "cp"),
        ("code2wav.", "codec"),
        ("speech_tokenizer.", "codec"),
        ("codec.", "codec"),
        ("token2wav.", "codec"),
    ):
        if name.startswith(pref):
            return comp, name[len(pref):]
    for pref in ("talker.", "model.talker.", "thinker."):
        if name.startswith(pref):
            return "talker", name[len(pref):]
    return "talker", name


def _gather_quantized(
    names: dict[str, np.ndarray], base: str, group_size: int, bits: int
) -> dict | None:
    """Assemble one linear param dict from HF/MLX tensors rooted at ``base``.

    Handles: MLX-quantized (weight+scales+biases), plain weight.
    """
    w = names.get(f"{base}.weight")
    scales = names.get(f"{base}.scales")
    biases = names.get(f"{base}.biases")
    if w is None:
        return None
    if scales is not None:
        in_dim = scales.shape[-1] * group_size
        codes = unpack_mlx_uint32(w, bits, in_dim)
        if biases is None:
            biases = np.zeros_like(scales)
        return {
            "q": codes.astype(np.uint8),
            "scale": scales.astype(np.float32),
            "bias": biases.astype(np.float32),
        }
    return {"w": w}


def import_hf_checkpoint(path: str, mode: str = "custom", **kwargs):
    """Import an HF/MLX snapshot directory into a Qwen3TTSModel.

    Components without tensors fall back to synthetic init (warned).
    """
    from .api import Qwen3TTSModel
    from .tokenizer import load_tokenizer

    hf_cfg = _read_hf_config(path)
    cfg = _config_from_hf(hf_cfg, mode)
    tensors = _collect_safetensors(path)

    by_comp: dict[str, dict[str, np.ndarray]] = {"talker": {}, "codec": {}, "cp": {}}
    for name, arr in tensors.items():
        comp, rest = _strip_prefix(name)
        by_comp[comp][rest] = arr

    gs, bits = cfg.quant.group_size, cfg.quant.bits
    unmapped: list[str] = []

    # ---- talker ----------------------------------------------------------
    from ..models.talker import init_talker
    from ..ops.quant import dequantize as _deq, quantize_weights as _quant

    talker = init_talker(cfg, seed=kwargs.get("seed", 0))
    tk = by_comp["talker"]
    mapped_any = False

    def _match_linear_format(value: dict, slot: dict) -> dict:
        """Convert a gathered linear param dict to the init slot's format
        (quantized <-> dense), so partial-precision checkpoints still load."""
        if ("q" in slot) == ("q" in value):
            return value
        if "q" in slot:  # slot quantized, checkpoint dense
            return _quant(np.asarray(value["w"], np.float32),
                          group_size=gs, bits=bits)
        return {"w": np.asarray(_deq(value), np.float32)}

    def put(tree_path: str, value, layer: int | None = None) -> None:
        nonlocal mapped_any
        node = talker
        parts = tree_path.split("/")
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        if layer is None:
            if isinstance(value, dict):
                node[leaf] = _match_linear_format(value, node[leaf])
            else:
                node[leaf] = value
        else:
            if isinstance(value, dict):
                value = _match_linear_format(value, node[leaf])
                for k, v in value.items():
                    node[leaf][k][layer] = v
            else:
                node[leaf][layer] = value
        mapped_any = True

    consumed: set[str] = set()
    for name in sorted(tk.keys()):
        if name in consumed or name.endswith((".scales", ".biases")):
            continue
        m = _LAYER_RE.match(name)
        if m:
            layer, rest = int(m.group(1)), m.group(2)
            if layer >= cfg.talker.n_layers:
                unmapped.append(name)
                continue
            if rest in _BLOCK_NORMS:
                put(f"blocks/{_BLOCK_NORMS[rest]}", tk[name], layer)
                consumed.add(name)
                continue
            base = rest[: -len(".weight")] if rest.endswith(".weight") else rest
            if base in _BLOCK_LINEARS:
                base_name = name[: len(name) - len(rest)] + base
                p = _gather_quantized(tk, base_name, gs, bits)
                if p is not None:
                    put(f"blocks/{_BLOCK_LINEARS[base]}", p, layer)
                    for suf in (".weight", ".scales", ".biases"):
                        consumed.add(base_name + suf)
                    continue
            unmapped.append(name)
            continue
        hit = False
        for frag, dest in _TALKER_TOP_MAP.items():
            if name == frag or name == frag + ".weight":
                if dest in ("text_emb", "codec_emb", "spk_emb", "ln_f"):
                    # embeddings/norms stay dense; MLX-quantized embedding
                    # tables are dequantized on import
                    base = frag[: -len(".weight")] if frag.endswith(".weight") else frag
                    if f"{base}.scales" in tk:
                        p = _gather_quantized(tk, base, gs, bits)
                        put(dest, np.asarray(_deq(p), np.float32))
                        for suf in (".weight", ".scales", ".biases"):
                            consumed.add(base + suf)
                    else:
                        put(dest, tk[name])
                        consumed.add(name)
                else:
                    p = _gather_quantized(tk, frag, gs, bits)
                    if p is None:
                        break
                    put(dest, p)
                    for suf in (".weight", ".scales", ".biases"):
                        consumed.add(frag + suf)
                hit = True
                break
        if not hit and name not in consumed:
            unmapped.append(name)

    if not mapped_any and tensors:
        warnings.warn(
            f"no talker tensors recognised in {path}; using synthetic init"
        )
    if unmapped:
        warnings.warn(
            f"{len(unmapped)} unmapped tensors during import "
            f"(first 10: {unmapped[:10]})"
        )

    # ---- code predictor + codec: synthetic unless native tensors exist ----
    from ..models.code_predictor import init_code_predictor
    from ..models.codec import init_codec

    for comp, label in (("codec", "codec"), ("cp", "code predictor")):
        if not by_comp[comp]:
            warnings.warn(
                f"checkpoint has no {label} tensors; using synthetic init "
                f"(talker-only import)"
            )
    cp_params = init_code_predictor(cfg, seed=1)
    codec_params = init_codec(cfg, seed=2)

    # host trees: api.apply_compute_format converts + places on device
    model = Qwen3TTSModel(
        cfg=cfg,
        params=talker,
        cp_params=cp_params,
        codec_params=codec_params,
        tokenizer=load_tokenizer(path, cfg.talker.vocab_size),
        name=os.path.basename(os.path.normpath(path)),
    )
    return model


# --------------------------------------------------------------------------
# entry point used by api.load_model
# --------------------------------------------------------------------------

def load_checkpoint(model_path: str, *, mode: str = "custom", cache: bool = True,
                    **kwargs):
    """Load ``model_path`` (native or HF/MLX layout) -> Qwen3TTSModel.

    HF imports are converted once and cached under ``model_path/_tpu_native``.
    """
    if is_native_dir(model_path):
        return load_native(model_path, **kwargs)

    native = os.path.join(model_path, NATIVE_DIR)
    if cache and is_native_dir(native):
        return load_native(native, **kwargs)

    model = import_hf_checkpoint(model_path, mode=mode, **kwargs)
    if cache:
        try:
            save_model(model, native)
        except Exception as e:  # read-only model dirs are fine
            warnings.warn(f"could not cache native conversion: {e}")
    return model
