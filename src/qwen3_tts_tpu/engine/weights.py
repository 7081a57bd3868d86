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

Import covers all three components (talker, code predictor, codec) and is
strict by default: a component whose tensors are present but unrecognised
raises ``CheckpointImportError`` (a wrongly-guessed layout must never produce
silent garbage audio), and a component with no tensors at all raises unless
``allow_partial=True`` is passed explicitly — partial imports fall back to
synthetic init with a warning and are NOT cached to ``_tpu_native/``.
Unmapped tensor names are collected into ``model.import_report`` and warned,
never silently dropped. Checkpoints with unusual names can ship a
``_tpu_rename.json`` ``{checkpoint_name: "component.dotted.native.path"}``
mapping next to their safetensors.
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
RENAME_FILE = "_tpu_rename.json"
_COMPONENTS = ("talker", "code_predictor", "codec")


class CheckpointImportError(ValueError):
    """A checkpoint's tensors are present but could not be mapped onto the
    model pytrees (unrecognised layout), or required components are missing
    and ``allow_partial`` was not set."""


@dataclasses.dataclass
class ImportReport:
    """What an HF/MLX import actually did — attached to the returned model
    as ``import_report`` so callers (and tests) can audit the conversion."""

    assigned: dict[str, int]           # component -> tensors mapped
    synthetic: tuple[str, ...]         # components that fell back to init
    unmapped: list[str]                # checkpoint tensor names not consumed
    # speech_tokenizer.* audit: {"tensors": N, "mapped": N,
    # "family": "mimi"|"unknown", "preserved": bool, "names": [...]} —
    # recorded even when the layout is unrecognised, so the conversion
    # keeps enough to act on later (VERDICT r2 #4)
    speech_tokenizer: dict | None = None
    # prompt-template audit: {"source": "file"|"chat_template"|"synthetic",
    # "samples": {mode: rendered str}} — what the engine will actually
    # condition the talker on, surfaced so first contact with real weights
    # can eyeball the render instead of debugging garbage audio
    prompt_template: dict | None = None


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
        def tup(v):  # deep list -> tuple (speaker_tokens nests pairs)
            return tuple(tup(x) for x in v) if isinstance(v, list) else v

        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: tup(v) for k, v in sub.items() if k in fields})

    code2wav = None
    if d.get("code2wav"):
        from ..models.code2wav import Code2WavConfig

        code2wav = build(Code2WavConfig, d["code2wav"])
    return ModelConfig(
        mode=d.get("mode", "custom"),
        talker=build(TalkerConfig, d.get("talker", {})),
        code_predictor=build(CodePredictorConfig, d.get("code_predictor", {})),
        codec=build(CodecConfig, d.get("codec", {})),
        quant=build(QuantConfig, d.get("quant", {})),
        codec_arch=d.get("codec_arch", "rvq"),
        code2wav=code2wav,
        dtype=d.get("dtype", "bfloat16"),
        max_seq_len=d.get("max_seq_len", 3072),
        native_speed=d.get("native_speed", False),
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
    cfg_d = config_to_dict(model.cfg)
    if getattr(model, "sampling", None) is not None:
        # persist the adopted talker sampling (generation_config.json
        # intent) — a native dir exported OUTSIDE the HF snapshot has no
        # other record of it (config_from_dict ignores unknown keys)
        cfg_d["sampling"] = dataclasses.asdict(model.sampling)
    if getattr(model, "st_cfg", None) is not None:
        cfg_d["speech_tokenizer"] = dataclasses.asdict(model.st_cfg)
    with open(os.path.join(path, NATIVE_CONFIG), "w") as f:
        json.dump(cfg_d, f, indent=2)

    trees = {
        "talker": model.params,
        "code_predictor": model.cp_params,
        "codec": model.codec_params,
    }
    if getattr(model, "st_params", None) is not None:
        trees["speech_tokenizer"] = model.st_params
    if getattr(model, "st_raw", None):
        # unrecognised speech_tokenizer tensors, verbatim: a future mapper
        # can act on the cached conversion instead of needing the snapshot
        from safetensors.numpy import save_file as _sf

        _sf({k: np.ascontiguousarray(v) for k, v in model.st_raw.items()},
            os.path.join(path, "speech_tokenizer_raw.safetensors"))
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

    from ..runtime.prompts import load_prompt_template

    from ..runtime.sampling import SamplingConfig

    with open(os.path.join(path, NATIVE_CONFIG)) as f:
        cfg_d = json.load(f)
    cfg = config_from_dict(cfg_d)
    # host trees: api.apply_compute_format converts + places on device
    trees = {c: _load_component(path, c) for c in _COMPONENTS}
    st_params = st_cfg = st_raw = None
    if isinstance(cfg_d.get("speech_tokenizer"), dict) and os.path.exists(
        os.path.join(path, "speech_tokenizer.safetensors")
    ):
        from ..models.speech_tokenizer import SpeechTokenizerConfig

        d = cfg_d["speech_tokenizer"]
        fields = {f.name for f in dataclasses.fields(SpeechTokenizerConfig)}
        st_cfg = SpeechTokenizerConfig(**{
            k: (tuple(v) if isinstance(v, list) else v)
            for k, v in d.items() if k in fields
        })
        st_params = _load_component(path, "speech_tokenizer")
    raw_p = os.path.join(path, "speech_tokenizer_raw.safetensors")
    if os.path.exists(raw_p):
        from safetensors.numpy import load_file as _lf

        st_raw = _lf(raw_p)
    # template/tokenizer files live in the snapshot root when this is a
    # _tpu_native cache dir inside one — prefer the parent in that case
    aux = os.path.dirname(os.path.normpath(path)) if (
        os.path.basename(os.path.normpath(path)) == NATIVE_DIR
    ) else path
    return Qwen3TTSModel(
        cfg=cfg,
        params=trees["talker"],
        cp_params=trees["code_predictor"],
        codec_params=trees["codec"],
        tokenizer=load_tokenizer(aux, cfg.talker.vocab_size),
        template=load_prompt_template(aux),
        name=os.path.basename(os.path.normpath(path)),
        sampling=(
            SamplingConfig(**cfg_d["sampling"])
            if isinstance(cfg_d.get("sampling"), dict)
            else sampling_from_generation_config(aux)
        ),
        st_params=st_params,
        st_cfg=st_cfg,
        st_raw=st_raw,
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


def sampling_from_generation_config(path: str):
    """The checkpoint's intended TALKER sampling (generation_config.json
    do_sample/temperature/top_k/top_p), or None when absent/unreadable.
    Real checkpoints ship the sampling the model was tuned for; running a
    different temperature than intended audibly changes speech quality, so
    the loaded model's engines default to these (callers can still pass an
    explicit SamplingConfig)."""
    from ..runtime.sampling import SamplingConfig

    p = os.path.join(path, "generation_config.json")
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            gc = json.load(f)
    except (OSError, ValueError):
        return None
    if not isinstance(gc, dict):
        return None
    keys = ("do_sample", "temperature", "top_k", "top_p")
    if not any(k in gc for k in keys):
        return None  # file present but carries no sampling intent

    def _num(name, default, cast):
        v = gc.get(name)
        return default if v is None else cast(v)  # HF serializes nulls

    # HF GenerationConfig semantics: do_sample defaults FALSE — a config
    # carrying only temperature/top_p still decodes greedily under
    # transformers, and adopting the checkpoint's intent means matching
    # that, not inventing sampling it never asked for
    if not _num("do_sample", False, bool):
        return SamplingConfig(greedy=True)
    return SamplingConfig(
        temperature=_num("temperature", 0.9, float),
        top_k=_num("top_k", 50, int),
        top_p=_num("top_p", 1.0, float),
    )


def _first(d: dict, *keys, default=None):
    for k in keys:
        if k in d and d[k] is not None:
            return d[k]
    return default


def _prompt_head_ids(talker_cfg: dict) -> dict:
    """Codec prompt-head ids from a checkpoint config, all-or-none."""
    ids = {
        "codec_nothink": _first(talker_cfg, "codec_nothink_id",
                                "codec_nothink_token_id", default=None),
        "codec_think_bos": _first(talker_cfg, "codec_think_bos_id",
                                  "codec_think_bos_token_id", default=None),
        "codec_think_eos": _first(talker_cfg, "codec_think_eos_id",
                                  "codec_think_eos_token_id", default=None),
    }
    n = sum(v is not None for v in ids.values())
    if 0 < n < 3:
        warnings.warn(
            f"checkpoint defines only {n}/3 codec prompt-head ids "
            f"({ids}); ignoring the partial head (unrecognised key "
            "spelling? add the missing id via _tpu_rename.json-style "
            "config override)"
        )
        return {k: None for k in ids}
    return ids


def _config_from_hf(hf: dict, mode: str) -> ModelConfig:
    """ModelConfig from an HF config.json: talker dims from the top level /
    ``talker_config``; code-predictor and codec geometry from their own
    sections when present (``code_predictor_config``; ``codec_config`` /
    ``code2wav_config`` / ``speech_tokenizer_config``). Unknown fields keep
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
        codec_vocab=_first(talker_cfg, "codec_vocab_size", "codec_vocab",
                           default=t.codec_vocab),
        codec_bos=_first(talker_cfg, "codec_bos_token_id", "codec_bos_id",
                         default=t.codec_bos),
        codec_eos=_first(talker_cfg, "codec_eos_token_id", "codec_eos_id",
                         default=t.codec_eos),
        codec_pad=_first(talker_cfg, "codec_pad_token_id", "codec_pad_id",
                         default=t.codec_pad),
        # codec prompt-head control ids (published talker family leads the
        # codec stream with nothink/think_bos/think_eos — PARITY.md); None
        # when the checkpoint doesn't define them. All-or-none: a partial
        # set (an unrecognised key spelling) is dropped with a warning
        # rather than emitting a head that matches no published layout
        **_prompt_head_ids(talker_cfg),
        # speaker-name -> codec-token map (published configs:
        # talker_config.speaker_id dict); speakers then condition as codec
        # control tokens in the prompt head
        speaker_tokens=tuple(
            sorted((str(k).lower(), int(v))
                   for k, v in talker_cfg["speaker_id"].items())
        ) if isinstance(talker_cfg.get("speaker_id"), dict) else None,
        n_speakers=_first(talker_cfg, "num_speakers", "n_speakers",
                          default=t.n_speakers),
        frames_per_step=_first(talker_cfg, "frames_per_step",
                               default=t.frames_per_step),
        # trailing-text control ids (published top-level config; the
        # talker re-reads the text during decode under the residual_sum
        # feedback protocol — runtime/generate.py). Recording them is
        # harmless on their own; import_hf_checkpoint only flips
        # feedback="residual_sum" when the full evidence set is present.
        tts_pad_id=_first(hf, "tts_pad_token_id",
                          default=_first(talker_cfg, "tts_pad_token_id",
                                         default=None)),
        tts_bos_id=_first(hf, "tts_bos_token_id",
                          default=_first(talker_cfg, "tts_bos_token_id",
                                         default=None)),
        tts_eos_id=_first(hf, "tts_eos_token_id",
                          default=_first(talker_cfg, "tts_eos_token_id",
                                         default=None)),
    )

    cp = base.code_predictor
    cp_cfg = _first(hf, "code_predictor_config", "mtp_config", default={})
    if isinstance(cp_cfg, dict) and cp_cfg:
        cp = dataclasses.replace(
            cp,
            hidden=cp_cfg.get("hidden_size", cp.hidden),
            n_layers=cp_cfg.get("num_hidden_layers", cp.n_layers),
            n_heads=cp_cfg.get("num_attention_heads", cp.n_heads),
            head_dim=cp_cfg.get("head_dim", cp.head_dim),
            ffn=cp_cfg.get("intermediate_size", cp.ffn),
            rms_eps=cp_cfg.get("rms_norm_eps", cp.rms_eps),
            rope_theta=cp_cfg.get("rope_theta", cp.rope_theta),
        )

    cc = base.codec
    # NOTE: code2wav_config is NOT consumed here — a checkpoint carrying it
    # switches to the real decoder below (configs.with_code2wav derives the
    # legacy codec section from its geometry)
    cc_cfg = _first(hf, "codec_config", "speech_tokenizer_config",
                    default={})
    if isinstance(cc_cfg, dict) and cc_cfg:
        cc = dataclasses.replace(
            cc,
            sample_rate=_first(cc_cfg, "sample_rate", "sampling_rate",
                               default=cc.sample_rate),
            frame_rate=_first(cc_cfg, "frame_rate", default=cc.frame_rate),
            num_codebooks=_first(cc_cfg, "num_codebooks", "num_quantizers",
                                 default=cc.num_codebooks),
            codebook_size=cc_cfg.get("codebook_size", cc.codebook_size),
            residual_codebook_size=_first(
                cc_cfg, "residual_codebook_size",
                default=cc.residual_codebook_size),
            latent_dim=_first(cc_cfg, "latent_dim", "codebook_dim",
                              default=cc.latent_dim),
            upsample_rates=tuple(_first(cc_cfg, "upsample_rates",
                                        "upsampling_ratios",
                                        default=cc.upsample_rates)),
            decoder_channels=tuple(cc_cfg.get("decoder_channels",
                                              cc.decoder_channels)),
            decoder_kernel=_first(cc_cfg, "decoder_kernel",
                                  "decoder_kernel_size",
                                  default=cc.decoder_kernel),
            n_transformer_layers=_first(cc_cfg, "n_transformer_layers",
                                        "num_transformer_layers",
                                        default=cc.n_transformer_layers),
            transformer_heads=_first(cc_cfg, "transformer_heads",
                                     "num_transformer_heads",
                                     default=cc.transformer_heads),
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
    out = dataclasses.replace(
        base, talker=talker, code_predictor=cp, codec=cc, quant=quant,
        native_speed=True,
        # the app's speaker pickers list the checkpoint's own speakers
        # when it defines the name -> codec-token map
        speakers=(tuple(n for n, _ in talker.speaker_tokens)
                  if talker.speaker_tokens else base.speakers),
    )
    # a checkpoint with a code2wav section runs the REAL decoder family
    # (models/code2wav.py) — geometry comes entirely from its config
    c2w_cfg = hf.get("code2wav_config")
    if isinstance(c2w_cfg, dict) and c2w_cfg:
        from ..models.code2wav import Code2WavConfig

        out = configs.with_code2wav(out, Code2WavConfig.from_hf_dict(c2w_cfg))
    return out


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
    # codec_head takes precedence over lm_head (first assignment wins and
    # names are scanned in sorted order); a text-vocab lm_head additionally
    # fails the shape check against the codec-vocab head slot
    "codec_head": "head",
    "lm_head": "head",
    "speaker_embedding.weight": "spk_emb",
    "spk_embed.weight": "spk_emb",
}
_TALKER_DENSE = frozenset({"text_emb", "codec_emb", "spk_emb", "ln_f"})
# code-predictor top-level tensors (depth transformer, models/code_predictor.py)
_CP_TOP_MAP = {
    "in_proj": "in_proj",
    "hidden_proj": "in_proj",
    "model.in_proj": "in_proj",
    "cb0_embedding.weight": "cb0_emb",
    "codec_embedding.weight": "cb0_emb",
    "embed_tokens.weight": "cb0_emb",
    "res_embedding.weight": "res_emb",     # stacked [Q-1, V_res, H]
    "heads.weight": "heads",               # stacked [Q-1, V_res, H]
    "norm.weight": "ln_f",
    "model.norm.weight": "ln_f",
}
_CP_DENSE = frozenset({"cb0_emb", "res_emb", "heads", "ln_f"})
# per-codebook variants: res_embeddings.3.weight -> res_emb[3]. The
# published layout (transformers Qwen3OmniMoeTalkerCodePredictor*) uses
# lm_head.{i} and model.codec_embedding.{i} ModuleLists — same per-depth
# structure as our stacked res_emb/heads.
_CP_INDEXED = {"res_embeddings": "res_emb", "res_embs": "res_emb",
               "codec_embedding": "res_emb", "res_embedding": "res_emb",
               "heads": "heads", "lm_heads": "heads", "lm_head": "heads"}
_INDEXED_RE = re.compile(r"^(?:model\.)?([A-Za-z_]+)\.(\d+)\.weight$")
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
        # the Base checkpoint's ref-audio -> codes speech tokenizer: its
        # architecture is not recoverable offline (PARITY.md), so its
        # tensors route to a dedicated bucket — tolerated with a specific
        # warning instead of polluting the codec's unmapped list or
        # failing an otherwise-complete import
        ("speech_tokenizer.", "spk_enc"),
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


def _extract_text_projection(
    tk: dict[str, np.ndarray], gs: int, bits: int
) -> tuple[dict | None, int]:
    """Pull the talker's text_projection ResizeMLP out of the tensor dict
    (transformers Qwen3OmniMoeTalkerResizeMLP: biased linear_fc1 -> act ->
    biased linear_fc2). Returns (params tree for ``text_proj`` | None,
    tensors consumed). Consumed names are removed from ``tk`` so the
    generic transformer import doesn't report them unmapped."""
    names = [n for n in tk if "text_projection" in n]
    if not names:
        return None, 0
    out: dict = {}
    consumed: list[str] = []
    for fc, key in (("linear_fc1", "fc1"), ("linear_fc2", "fc2")):
        base = next(
            (n[: -len(".weight")] for n in names
             if fc in n and n.endswith(".weight")),
            None,
        )
        if base is None:
            raise CheckpointImportError(
                f"text_projection tensors present but {fc}.weight missing "
                f"(found: {sorted(names)[:6]}) — layout unrecognised"
            )
        lin = _gather_quantized(tk, base, gs, bits)
        bias = tk.get(f"{base}.bias")
        if bias is not None:
            lin = dict(lin, b=bias)
            consumed.append(f"{base}.bias")
        out[key] = lin
        for suf in (".weight", ".scales", ".biases"):
            if f"{base}{suf}" in tk:
                consumed.append(f"{base}{suf}")
    for n in consumed:
        tk.pop(n, None)
    return out, len(consumed)


def _match_linear_format(value: dict, slot: dict, gs: int, bits: int) -> dict:
    """Convert a gathered linear param dict to the init slot's format
    (quantized <-> dense), so partial-precision checkpoints still load."""
    from ..ops.quant import dequantize as _deq, quantize_weights as _quant

    if ("q" in slot) == ("q" in value):
        return value
    if "q" in slot:  # slot quantized, checkpoint dense
        return _quant(np.asarray(value["w"], np.float32),
                      group_size=gs, bits=bits)
    return {"w": np.asarray(_deq(value), np.float32)}


def _shape_ok(slot, value) -> bool:
    if isinstance(slot, dict):
        return isinstance(value, dict) and set(slot) == set(value) and all(
            np.shape(slot[k]) == np.shape(value[k]) for k in slot
        )
    return not isinstance(value, dict) and np.shape(slot) == np.shape(value)


def _try_native_path(tree: Any, name: str, arr: np.ndarray) -> bool:
    """Assign a tensor named by a dotted native pytree path (the layout
    ``save_model`` writes, dots for slashes — e.g. ``dec.stages.0.up.w``).
    Shape-validated; returns False if the path or shape doesn't match."""
    parts = name.split(".")
    node = tree
    for p in parts[:-1]:
        if isinstance(node, dict) and p in node:
            node = node[p]
        elif isinstance(node, (list, tuple)) and p.isdigit() and int(p) < len(node):
            node = node[int(p)]
        else:
            return False
    leaf = parts[-1]
    if isinstance(node, dict) and leaf in node:
        slot = node[leaf]
        if not isinstance(slot, dict) and np.shape(slot) == np.shape(arr):
            node[leaf] = np.asarray(arr)
            return True
    elif isinstance(node, list) and leaf.isdigit() and int(leaf) < len(node):
        slot = node[int(leaf)]
        if not isinstance(slot, dict) and np.shape(slot) == np.shape(arr):
            node[int(leaf)] = np.asarray(arr)
            return True
    return False


def _import_transformer(
    tree: dict,
    tk: dict[str, np.ndarray],
    *,
    n_layers: int,
    top_map: dict[str, str],
    dense_dests: frozenset,
    gs: int,
    bits: int,
    unmapped: list[str],
    comp: str,
    indexed: dict[str, str] | None = None,
    block_norms: dict[str, str] | None = None,
) -> int:
    """Map Qwen-style transformer tensor names onto a stacked-block pytree
    (shared by talker, code predictor and the code2wav pre-transformer).
    Every assignment is shape-validated against the init slot; failures
    land in ``unmapped`` with a reason. Returns the number of mapped
    tensors. ``block_norms`` overrides the per-layer exact-name map
    (default: the Qwen3 q/k-norm + pre/post layernorm set)."""
    from ..ops.quant import dequantize as _deq

    count = 0
    consumed: set[str] = set()
    assigned_tops: set[str] = set()
    if block_norms is None:
        block_norms = _BLOCK_NORMS

    def fail(name: str, why: str) -> None:
        unmapped.append(f"{comp}:{name} ({why})")

    def put_top(dest: str, value) -> bool:
        nonlocal count
        if dest in assigned_tops:
            return False
        slot = tree[dest]
        if isinstance(value, dict):
            value = _match_linear_format(value, slot, gs, bits)
        if not _shape_ok(slot, value):
            return False
        # checkpoint precision is kept as-is (fp32 tables stay fp32; the
        # runtime casts at use) — imports must be lossless
        tree[dest] = value
        assigned_tops.add(dest)
        count += 1
        return True

    def promote(stack: np.ndarray, value) -> np.ndarray:
        """Checkpoint precision wins: writing fp32 values into a bf16 init
        stack must not round them (golden fidelity, BASELINE.md)."""
        want = np.result_type(stack.dtype, np.asarray(value).dtype)
        return stack if stack.dtype == want else stack.astype(want)

    def put_block(rel_path: str, value, layer: int) -> bool:
        nonlocal count
        node = tree["blocks"]
        parts = rel_path.split("/")
        for p in parts[:-1]:
            node = node[p]
        leaf = parts[-1]
        slot = node[leaf]
        if isinstance(value, dict):
            slot_layer = {k: v[layer] for k, v in slot.items()}
            value = _match_linear_format(value, slot_layer, gs, bits)
            if not _shape_ok(slot_layer, value):
                return False
            for k, v in value.items():
                slot[k] = promote(slot[k], v)
                slot[k][layer] = v
            node[leaf] = slot
        else:
            if np.shape(slot[layer]) != np.shape(value):
                return False
            slot = promote(slot, value)
            slot[layer] = value
            node[leaf] = slot
        count += 1
        return True

    for name in sorted(tk.keys()):
        if name in consumed or name.endswith((".scales", ".biases")):
            continue
        arr = tk[name]
        m = _LAYER_RE.match(name)
        if m:
            layer, rest = int(m.group(1)), m.group(2)
            if layer >= n_layers:
                fail(name, f"layer {layer} >= n_layers {n_layers}")
                continue
            if rest in block_norms:
                if put_block(block_norms[rest], arr, layer):
                    consumed.add(name)
                else:
                    fail(name, "shape mismatch")
                continue
            base = rest[: -len(".weight")] if rest.endswith(".weight") else rest
            if base in _BLOCK_LINEARS:
                base_name = name[: len(name) - len(rest)] + base
                p = _gather_quantized(tk, base_name, gs, bits)
                if p is not None and put_block(_BLOCK_LINEARS[base], p, layer):
                    for suf in (".weight", ".scales", ".biases"):
                        consumed.add(base_name + suf)
                    continue
                fail(name, "shape mismatch")
                continue
            fail(name, "unrecognised block tensor")
            continue

        mi = _INDEXED_RE.match(name) if indexed else None
        if mi and mi.group(1) in indexed:
            dest, idx = indexed[mi.group(1)], int(mi.group(2))
            slot = tree[dest]
            if idx < slot.shape[0] and np.shape(slot[idx]) == np.shape(arr):
                # lossless like put_top/put_block: an fp32 per-codebook
                # tensor must not round into a bf16 init stack
                want = np.result_type(slot.dtype, np.asarray(arr).dtype)
                if slot.dtype != want:
                    slot = slot.astype(want)
                    tree[dest] = slot
                slot[idx] = arr
                count += 1
                consumed.add(name)
            else:
                fail(name, "index/shape mismatch")
            continue

        hit = False
        for frag, dest in top_map.items():
            if name != frag and name != frag + ".weight":
                continue
            base = frag[: -len(".weight")] if frag.endswith(".weight") else frag
            if dest in dense_dests:
                # embeddings/norms stay dense; MLX-quantized tables are
                # dequantized on import
                if f"{base}.scales" in tk:
                    value = np.asarray(
                        _deq(_gather_quantized(tk, base, gs, bits)), np.float32
                    )
                else:
                    value = arr
                if put_top(dest, value):
                    for suf in ("", ".weight", ".scales", ".biases"):
                        consumed.add(base + suf)
                    hit = True
            else:
                p = _gather_quantized(tk, base, gs, bits)
                if p is not None and put_top(dest, p):
                    for suf in (".weight", ".scales", ".biases"):
                        consumed.add(base + suf)
                    hit = True
            if hit:
                break
        if hit or name in consumed:
            continue
        if _try_native_path(tree, name, arr):
            count += 1
            continue
        fail(name, "no mapping")
    return count


# HF code2wav tensor-path fragments -> our pytree dotted paths
# (see models/code2wav.py init_code2wav; the HF module structure is
# transformers Qwen3OmniMoeCode2Wav, parity-tested in tests/test_code2wav).
_C2W_CONVNEXT = {
    "dwconv.conv.weight": "cnx.dw.w",
    "dwconv.conv.bias": "cnx.dw.b",
    "norm.weight": "cnx.ln_w",
    "norm.bias": "cnx.ln_b",
    "pwconv1.weight": "cnx.pw1.w",
    "pwconv1.bias": "cnx.pw1.b",
    "pwconv2.weight": "cnx.pw2.w",
    "pwconv2.bias": "cnx.pw2.b",
    "gamma": "cnx.gamma",
}
_C2W_BLOCK_NORMS = {
    "input_layernorm.weight": "ln1",
    "post_attention_layernorm.weight": "ln2",
    "self_attn_layer_scale.scale": "ls_attn",
    "mlp_layer_scale.scale": "ls_mlp",
}


def _c2w_native_name(name: str, n_rates: int) -> str | None:
    """Translate an HF code2wav tensor path (after the ``code2wav.``
    component prefix) to our dotted pytree path; None if unrecognised."""
    m = re.match(r"^upsample\.(\d+)\.0\.conv\.(weight|bias)$", name)
    if m:
        return f"upsample.{m.group(1)}.tconv." + ("w" if m.group(2) == "weight" else "b")
    m = re.match(r"^upsample\.(\d+)\.1\.(.+)$", name)
    if m and m.group(2) in _C2W_CONVNEXT:
        return f"upsample.{m.group(1)}." + _C2W_CONVNEXT[m.group(2)]
    m = re.match(r"^decoder\.0\.conv\.(weight|bias)$", name)
    if m:
        return "decoder.conv_in." + ("w" if m.group(1) == "weight" else "b")
    m = re.match(r"^decoder\.(\d+)\.block\.(\d+)\.(.+)$", name)
    if m:
        blk, j, rest = int(m.group(1)) - 1, int(m.group(2)), m.group(3)
        if not 0 <= blk < n_rates:
            return None
        base = f"decoder.blocks.{blk}"
        if j == 0 and rest in ("alpha", "beta"):
            return f"{base}.snake.{rest}"
        if j == 1 and rest in ("conv.weight", "conv.bias"):
            return f"{base}.tconv." + ("w" if rest == "conv.weight" else "b")
        if 2 <= j <= 4:
            sub = {
                "act1.alpha": "a1.alpha", "act1.beta": "a1.beta",
                "conv1.conv.weight": "c1.w", "conv1.conv.bias": "c1.b",
                "act2.alpha": "a2.alpha", "act2.beta": "a2.beta",
                "conv2.conv.weight": "c2.w", "conv2.conv.bias": "c2.b",
            }.get(rest)
            return f"{base}.res.{j - 2}.{sub}" if sub else None
        return None
    m = re.match(rf"^decoder\.{n_rates + 1}\.(alpha|beta)$", name)
    if m:
        return f"decoder.snake_out.{m.group(1)}"
    m = re.match(rf"^decoder\.{n_rates + 2}\.conv\.(weight|bias)$", name)
    if m:
        return "decoder.conv_out." + ("w" if m.group(1) == "weight" else "b")
    return None


def _import_code2wav(
    tree: dict, c2w_cfg, tensors: dict[str, np.ndarray],
    gs: int, bits: int, unmapped: list[str],
) -> int:
    """Map HF ``code2wav.*`` tensors (transformers Qwen3OmniMoeCode2Wav
    module paths) onto the models/code2wav.py pytree. The pre-transformer
    reuses the shared Qwen-style stacked-block importer (quant-aware); the
    conv/upsample/decoder stack maps by translated native path. Returns the
    number of tensors mapped; unrecognised names land in ``unmapped``."""
    from ..ops.quant import dequantize as _deq

    count = 0
    pre: dict[str, np.ndarray] = {}
    rest: dict[str, np.ndarray] = {}
    for name, arr in tensors.items():
        if name.startswith("pre_transformer."):
            pre[name[len("pre_transformer."):]] = arr
        else:
            rest[name] = arr

    if pre:
        count += _import_transformer(
            tree["pre"], pre,
            n_layers=c2w_cfg.n_layers,
            top_map={"norm.weight": "ln_f"},
            dense_dests=frozenset({"ln_f"}),
            gs=gs, bits=bits, unmapped=unmapped, comp="code2wav.pre",
            block_norms=_C2W_BLOCK_NORMS,
        )

    n_rates = len(c2w_cfg.upsample_rates)
    for name in sorted(rest):
        if name.endswith((".scales", ".biases")):
            continue
        arr = rest[name]
        if name in ("code_embedding.weight", "code_embedding"):
            base = "code_embedding"
            if f"{base}.scales" in rest:  # MLX-quantized table: dequantize
                arr = np.asarray(
                    _deq(_gather_quantized(rest, base, gs, bits)), np.float32
                )
            if np.shape(tree["code_emb"]) == np.shape(arr):
                tree["code_emb"] = np.asarray(arr)
                count += 1
            else:
                unmapped.append(f"code2wav:{name} (shape mismatch)")
            continue
        native = _c2w_native_name(name, n_rates)
        if native is not None and _try_native_path(tree, native, arr):
            count += 1
        else:
            unmapped.append(f"code2wav:{name} (no mapping)")
    return count


def _import_codec(
    tree: dict, tensors: dict[str, np.ndarray], unmapped: list[str]
) -> int:
    """Map codec tensors named by dotted native paths (``dec.cb0_emb``,
    ``dec.stages.0.up.w``, ``enc...``, ``spk_proj.w`` — the geometry of
    models/codec.py, derived from config.json's codec section)."""
    count = 0
    for name in sorted(tensors):
        if _try_native_path(tree, name, tensors[name]):
            count += 1
        else:
            unmapped.append(f"codec:{name} (no native path / shape mismatch)")
    return count


def _apply_rename(path: str, tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Apply an optional ``_tpu_rename.json`` {checkpoint_name: new_name}
    map, so unusual snapshot layouts can be adapted without code changes."""
    p = os.path.join(path, RENAME_FILE)
    if not os.path.exists(p):
        return tensors
    with open(p) as f:
        ren = json.load(f)
    return {ren.get(k, k): v for k, v in tensors.items()}


def import_hf_checkpoint(
    path: str,
    mode: str = "custom",
    *,
    allow_partial: bool = False,
    **kwargs,
):
    """Import an HF/MLX snapshot directory into a Qwen3TTSModel.

    All three components (talker / code predictor / codec) are mapped.
    Strictness contract:

    - a component with tensors present but none recognised raises
      ``CheckpointImportError`` — a mis-guessed layout must fail loudly,
      never produce a random-weights component (garbage audio);
    - a component with NO tensors raises too, unless ``allow_partial=True``
      (then it falls back to synthetic init with a warning and the
      conversion is not cached by ``load_checkpoint``).

    The returned model carries an ``import_report`` (ImportReport).
    """
    from .api import Qwen3TTSModel
    from .tokenizer import load_tokenizer
    from ..models.code_predictor import init_code_predictor
    from ..models.codec import init_codec
    from ..models.talker import init_talker

    hf_cfg = _read_hf_config(path)
    cfg = _config_from_hf(hf_cfg, mode)
    tensors = _apply_rename(path, _collect_safetensors(path))

    by_comp: dict[str, dict[str, np.ndarray]] = {
        "talker": {}, "codec": {}, "cp": {}, "spk_enc": {},
    }
    for name, arr in tensors.items():
        comp, rest = _strip_prefix(name)
        by_comp[comp][rest] = arr
    if by_comp["spk_enc"]:
        if not by_comp["codec"]:
            # no codec tensors anywhere else: this checkpoint's codes->wav
            # decoder may live INSIDE the speech-tokenizer module (some
            # packagings; _config_from_hf reads speech_tokenizer_config for
            # codec geometry for the same reason). Route the bucket through
            # the codec import — recognised decoder names map, anything
            # else fails loudly there instead of silently synthesizing.
            by_comp["codec"] = by_comp.pop("spk_enc")
            by_comp["spk_enc"] = {}

    gs, bits = cfg.quant.group_size, cfg.quant.bits
    unmapped: list[str] = []
    assigned: dict[str, int] = {}

    # speech_tokenizer.* (the ref-audio encoder for cloning): map the
    # Mimi-family layout (models/speech_tokenizer.py); anything else is
    # PRESERVED in the native cache + reported — never silently dropped
    st_params = st_cfg = st_raw = None
    st_report: dict | None = None
    if by_comp["spk_enc"]:
        st_tensors = by_comp["spk_enc"]
        st_report = {
            "tensors": len(st_tensors), "mapped": 0,
            "family": "unknown", "preserved": False,
            "names": sorted(st_tensors)[:12],
        }
        from ..models.speech_tokenizer import (
            import_speech_tokenizer,
            st_config_from_tensors,
        )

        try:
            st_cfg = st_config_from_tensors(
                st_tensors, hf_cfg.get("speech_tokenizer_config") or {}
            )
        except ValueError as e:
            st_raw = dict(st_tensors)
            st_report["preserved"] = True
            warnings.warn(
                f"checkpoint ships {len(st_tensors)} speech_tokenizer "
                f"tensors in an unrecognised layout ({e}); cloning uses "
                "the synthetic feature encoder (PARITY.md) and the raw "
                "tensors are preserved in the native conversion for a "
                "future mapper. The rest of the checkpoint imports "
                "normally."
            )
        else:
            if (st_cfg.num_quantizers != cfg.codec.num_codebooks
                    or st_cfg.codebook_size != cfg.codec.codebook_size):
                warnings.warn(
                    "speech_tokenizer maps as a Mimi-family encoder but "
                    f"its code space (Q={st_cfg.num_quantizers}, "
                    f"size={st_cfg.codebook_size}) does not match the "
                    f"codec (Q={cfg.codec.num_codebooks}, "
                    f"size={cfg.codec.codebook_size}); preserving raw "
                    "tensors, cloning stays on the synthetic encoder"
                )
                st_raw, st_cfg = dict(st_tensors), None
                st_report["family"] = "mimi"
                st_report["preserved"] = True
            else:
                st_unmapped: list[str] = []
                st_params, st_n = import_speech_tokenizer(
                    st_tensors, st_cfg, st_unmapped
                )
                unmapped.extend(st_unmapped)
                st_report.update(family="mimi", mapped=st_n)
                assigned["speech_tokenizer"] = st_n
                if st_n == 0:
                    st_params, st_cfg = None, None
                    st_raw = dict(st_tensors)
                    st_report["preserved"] = True
                    warnings.warn(
                        "speech_tokenizer tensors matched the Mimi layout "
                        "by name but none fit the derived geometry; "
                        "preserving raw tensors, cloning stays on the "
                        "synthetic encoder"
                    )

    talker = init_talker(cfg, seed=kwargs.get("seed", 0))
    # the text_projection ResizeMLP (when shipped) is pulled out FIRST so
    # its names don't land in `unmapped` during the generic pass
    text_proj, tp_count = _extract_text_projection(by_comp["talker"], gs, bits)
    assigned["talker"] = _import_transformer(
        talker, by_comp["talker"],
        n_layers=cfg.talker.n_layers,
        top_map=_TALKER_TOP_MAP, dense_dests=_TALKER_DENSE,
        gs=gs, bits=bits, unmapped=unmapped, comp="talker",
    )
    if text_proj is not None:
        talker["text_proj"] = text_proj
        assigned["talker"] += tp_count

    if by_comp["cp"]:
        cp_updates = {}
        if not any("q_norm" in n for n in by_comp["cp"]):
            # the published code-predictor family has NO per-head qk-norm
            # (transformers Qwen3OmniMoeTalkerCodePredictorAttention):
            # applying one over weights that never trained with it
            # mis-scales every attention read, so follow the checkpoint
            cp_updates["qk_norm"] = False
        if not any("in_proj" in n or "hidden_proj" in n
                   for n in by_comp["cp"]):
            # no input projection -> the published two-position layout
            # ([talker hidden, cb0 embedding] — PARITY.md): the raw hidden
            # feeds the depth transformer directly, so widths must match
            if cfg.code_predictor.hidden != cfg.talker.hidden:
                raise CheckpointImportError(
                    "code-predictor checkpoint has no input projection but "
                    f"cp hidden {cfg.code_predictor.hidden} != talker "
                    f"hidden {cfg.talker.hidden}: layout unrecognised"
                )
            cp_updates["input_layout"] = "hidden_token"
            cp_updates["input_proj"] = False
        if cp_updates:
            cfg = dataclasses.replace(
                cfg,
                code_predictor=dataclasses.replace(
                    cfg.code_predictor, **cp_updates
                ),
            )
        # published decode protocol (PARITY.md item 3): a checkpoint whose
        # code predictor follows the two-position layout AND whose config
        # carries the think markers + tts control ids almost certainly
        # follows the full published generate loop — enable the
        # residual-sum talker feedback + trailing-text conditioning
        # (runtime/generate.py). All-or-none: missing tts ids leave the
        # cb0 protocol in place with a warning, never a half protocol.
        t = cfg.talker
        if (
            cfg.code_predictor.input_layout == "hidden_token"
            and t.codec_prompt_head
            # fps > 1 composes (the post-MTP-fine-tune protocol shape):
            # the evidence gate is about the CONDITIONING layout, which is
            # the same whether frames come one or n per weight pass
        ):
            tts = (t.tts_pad_id, t.tts_bos_id, t.tts_eos_id)
            if all(i is not None for i in tts):
                cfg = dataclasses.replace(
                    cfg,
                    talker=dataclasses.replace(t, feedback="residual_sum"),
                    # the published loop SAMPLES the residual depths
                    # (cp.generate(do_sample=True, top_k=50, top_p=0.8));
                    # applied only when the talker itself samples — greedy
                    # decode keeps greedy residuals (runtime cp_samples)
                    code_predictor=dataclasses.replace(
                        cfg.code_predictor, top_k=50, top_p=0.8
                    ),
                )
            else:
                warnings.warn(
                    "checkpoint matches the published code-predictor "
                    "layout and defines codec think markers, but "
                    "tts_{pad,bos,eos}_token_id are missing from its "
                    "config — running the cb0 feedback protocol (the "
                    "trailing-text loop needs those ids); add them via a "
                    "config override if the checkpoint expects the "
                    "published decode loop"
                )
    cp_params = init_code_predictor(cfg, seed=1)
    assigned["code_predictor"] = _import_transformer(
        cp_params, by_comp["cp"],
        n_layers=cfg.code_predictor.n_layers,
        top_map=_CP_TOP_MAP, dense_dests=_CP_DENSE,
        gs=min(gs, cfg.code_predictor.hidden), bits=bits,
        unmapped=unmapped, comp="code_predictor", indexed=_CP_INDEXED,
    )

    codec_params = init_codec(cfg, seed=2)
    if cfg.codec_arch == "code2wav":
        assigned["codec"] = _import_code2wav(
            codec_params["c2w"], cfg.code2wav, by_comp["codec"],
            gs, bits, unmapped,
        )
    else:
        assigned["codec"] = _import_codec(
            codec_params, by_comp["codec"], unmapped
        )

    synthetic: list[str] = []
    for comp, label in (
        ("talker", "talker"),
        ("cp", "code_predictor"),
        ("codec", "codec"),
    ):
        present = len(by_comp[comp])
        if present and assigned[label] == 0:
            raise CheckpointImportError(
                f"{present} {label} tensors present in {path} but none "
                f"recognised — unrecognised layout (first names: "
                f"{sorted(by_comp[comp])[:6]}). Refusing to substitute "
                f"random weights; add a {RENAME_FILE} map or fix the layout."
            )
        if not present:
            if not allow_partial:
                raise CheckpointImportError(
                    f"checkpoint {path} has no {label} tensors; pass "
                    f"allow_partial=True to fall back to synthetic init "
                    f"for missing components"
                )
            synthetic.append(label)
            warnings.warn(
                f"checkpoint has no {label} tensors; using synthetic init "
                f"(allow_partial)"
            )
    if unmapped:
        warnings.warn(
            f"{len(unmapped)} unmapped tensors during import "
            f"(first 10: {unmapped[:10]})"
        )

    from ..runtime.prompts import load_prompt_template

    template = load_prompt_template(path)
    tpl_report: dict = {"source": template.source, "samples": {}}
    for m, kw in (("custom", {"instruct": "Speak warmly.", "speed": 1.0}),
                  ("design", {"instruct": "A deep calm narrator."}),
                  ("base", {"ref_text": "Reference transcript."})):
        try:
            tpl_report["samples"][m] = template.render(m, "Sample text.", **kw)
        except Exception as e:  # a broken template must not kill the import
            tpl_report["samples"][m] = f"<render failed: {e}>"

    # host trees: api.apply_compute_format converts + places on device
    model = Qwen3TTSModel(
        cfg=cfg,
        params=talker,
        cp_params=cp_params,
        codec_params=codec_params,
        tokenizer=load_tokenizer(path, cfg.talker.vocab_size),
        template=template,
        name=os.path.basename(os.path.normpath(path)),
        sampling=sampling_from_generation_config(path),
        st_params=st_params,
        st_cfg=st_cfg,
        st_raw=st_raw,
    )
    model.import_report = ImportReport(
        assigned=assigned, synthetic=tuple(synthetic), unmapped=unmapped,
        speech_tokenizer=st_report, prompt_template=tpl_report,
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
    report = getattr(model, "import_report", None)
    if report is not None and report.synthetic:
        # never persist a conversion holding synthetic stand-ins — a later
        # process would load them as if they were real weights
        warnings.warn(
            f"not caching native conversion: synthetic components "
            f"{report.synthetic}"
        )
    elif cache:
        try:
            save_model(model, native)
        except Exception as e:  # read-only model dirs are fine
            warnings.warn(f"could not cache native conversion: {e}")
    return model
