"""Public engine API: ``load_model`` and ``generate_audio``.

Observable-contract parity with the mlx_audio functions the reference app
consumes (SURVEY.md §1 EXT):

- ``load_model(model_path) -> model``                  (reference io.py:111-112)
- ``generate_audio(model=, text=, voice=, instruct=, speed=, ref_audio=,
  ref_text=, output_path=, ...)`` writing ``audio_000.wav`` into
  ``output_path``                                       (reference io.py:156,
  custom.py:163-170, design.py:76-81, clone.py:218-224)

plus engine-level extras the reference couldn't offer (returned metrics with
RTF/TTFA, streaming callbacks, synthetic model specs for CI/bench).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

from . import configs
from .configs import ModelConfig
from .tokenizer import load_tokenizer

_SYNTH_RE = re.compile(
    r"^synthetic:(tiny|flagship|tiny-code2wav|flagship-code2wav)"
    r"(?::(custom|design|base))?$"
)


def compute_format() -> str:
    """Runtime weight format: ``int8`` (storage format, fused dequant
    matmuls) or ``bf16`` (weights dequantized once into HBM — the default on
    TPU, where the decode path is faster as dense bf16 MXU matmuls than as
    per-step VPU dequantization; int8 remains the on-disk/import format).
    Override with QWEN3_TTS_COMPUTE=int8|bf16.
    """
    mode = os.environ.get("QWEN3_TTS_COMPUTE", "auto")
    if mode in ("int8", "bf16"):
        return mode
    if mode not in ("", "auto"):
        raise ValueError(
            f"QWEN3_TTS_COMPUTE={mode!r}: expected 'int8' or 'bf16' "
            "(lowercase) — refusing to silently fall back to auto-detection"
        )
    import jax

    return "bf16" if jax.default_backend() == "tpu" else "int8"


def apply_compute_format(model: "Qwen3TTSModel") -> "Qwen3TTSModel":
    """Convert a loaded model's linears to the runtime compute format and
    place them on device.

    When converting int8 storage to bf16 compute, the int8 tree is uploaded
    and dequantized ON DEVICE (one jitted call over the whole tree): the
    host->device link moves ~2x fewer bytes, which dominates load time on
    tunneled TPUs (BENCH load_s). On CPU backends the dequantization runs
    in numpy instead (no compile round trip)."""
    import jax

    if model.cfg.quant.enabled and compute_format() == "bf16":
        from functools import partial

        import jax.numpy as jnp

        from ..ops.quant import dequantize_tree

        if jax.default_backend() == "cpu":
            model.params = dequantize_tree(model.params)
            model.cp_params = dequantize_tree(model.cp_params)
        else:
            deq = jax.jit(
                partial(dequantize_tree, dtype=jnp.bfloat16), donate_argnums=0
            )
            model.params = deq(jax.device_put(model.params))
            model.cp_params = deq(jax.device_put(model.cp_params))
        model._generator = None
    model.params = jax.device_put(model.params)
    model.cp_params = jax.device_put(model.cp_params)
    model.codec_params = jax.device_put(model.codec_params)
    return model


def _device_randomize(tree: Any, seed: int, post: Callable | None = None) -> Any:
    """Regenerate a host parameter pytree ON DEVICE, leaf by leaf.

    Synthetic weights' *values* are arbitrary — only shapes, dtypes and the
    value envelope matter (bench/compile checks use ``fast=True`` init for
    the same reason). Uploading ~2 GB of arbitrary bytes through the tunneled
    TPU link cost ~8 minutes (BENCH_r01 ``load_s`` 488 s); instead we read
    each host leaf's (shape, dtype, min, max) and have one jitted generator
    produce statistically-equivalent leaves directly in HBM. Constant leaves
    (norm scales, fast-init quant scale/bias grids) reproduce exactly.

    ``post`` (optional) is fused into the same jitted program — e.g. the
    int8->bf16 dequantization when the compute format is bf16, so load pays
    ONE remote compile instead of three (remote compiles are minutes on the
    tunneled TPU and are not covered by the persistent cache — CLAUDE.md).
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree.flatten(tree)
    specs = []  # (shape, dtype, lo, hi)
    for leaf in leaves:
        a = np.asarray(leaf)
        lo = float(a.min()) if a.size else 0.0
        hi = float(a.max()) if a.size else 0.0
        specs.append((a.shape, a.dtype, lo, hi))

    def gen(key):
        keys = jax.random.split(key, max(1, len(specs)))
        out = []
        for k, (shape, dtype, lo, hi) in zip(keys, specs):
            jdt = jnp.dtype(dtype)
            if jdt == jnp.uint8:
                bits = jax.random.bits(k, shape, dtype=jnp.uint8)
                span = int(hi) - int(lo) + 1
                if span >= 256 and int(lo) == 0:
                    out.append(bits)
                else:  # modulo bias irrelevant for synthetic values
                    out.append((bits % jnp.uint8(span) + jnp.uint8(int(lo))))
            elif lo == hi:
                out.append(jnp.full(shape, lo, dtype=jdt))
            else:
                u = jax.random.uniform(k, shape, jnp.float32, lo, hi)
                out.append(u.astype(jdt))
        t = jax.tree.unflatten(treedef, out)
        return post(t) if post is not None else t

    return jax.jit(gen)(jax.random.PRNGKey(seed))


@dataclass
class Qwen3TTSModel:
    """A loaded model: config + device parameter pytrees + tokenizer + the
    jit-stage cache (inside ``Generator``)."""

    cfg: ModelConfig
    params: Any                       # talker
    cp_params: Any                    # code predictor
    codec_params: Any
    tokenizer: Any
    name: str = "qwen3-tts"
    import_report: Any = None         # weights.ImportReport for HF imports
    template: Any = None              # runtime.prompts.PromptTemplate
    # the checkpoint's intended talker sampling (generation_config.json —
    # weights.sampling_from_generation_config); None = library defaults
    sampling: Any = None
    # real speech tokenizer (ref-audio -> codec codes, cloning): mapped
    # Mimi-family params + config when the checkpoint's layout was
    # recognised (models/speech_tokenizer.py); None = synthetic encoder
    st_params: Any = None
    st_cfg: Any = None
    # unrecognised speech_tokenizer.* tensors, preserved verbatim so the
    # native cache keeps them for a future mapper (weights.save_model)
    st_raw: Any = field(default=None, repr=False)
    _generator: Any = field(default=None, repr=False)
    _serving: Any = field(default=None, repr=False)
    _enc_fn: Any = field(default=None, repr=False)
    _st_fn: Any = field(default=None, repr=False)

    @property
    def generator(self):
        from ..runtime.generate import Generator
        from ..runtime.sampling import SamplingConfig

        if self._generator is None:
            self._generator = Generator(
                cfg=self.cfg,
                params=self.params,
                cp_params=self.cp_params,
                codec_params=self.codec_params,
                sampling=self.sampling or SamplingConfig(),
            )
        return self._generator

    def serving_engine(self, max_streams: int = 8):
        """Cached multi-stream engine (compiled stages persist across
        calls — one compile per process, SURVEY/PERF compile economics)."""
        from ..runtime.serving import ServingEngine

        if self._serving is None or self._serving.B != max_streams:
            self._serving = ServingEngine(
                self, max_streams=max_streams, sampling=self.sampling
            )
        return self._serving

    # -- construction ------------------------------------------------------

    @classmethod
    def synthetic(
        cls, cfg: ModelConfig, seed: int = 0, fast: bool = False
    ) -> "Qwen3TTSModel":
        """Random-initialised model with the production pytree layout —
        used by CI, benchmarks and when no checkpoint is on disk.
        ``fast=True`` skips the quantization solve (bench/compile checks)."""
        import jax

        from ..models.code_predictor import init_code_predictor
        from ..models.codec import init_codec
        from ..models.talker import init_talker

        params = init_talker(cfg, seed, fast=fast)
        cp_params = init_code_predictor(cfg, seed + 1, fast=fast)
        if fast and jax.default_backend() != "cpu":
            # fast path: regenerate the two big trees on device instead of
            # uploading them through the (slow, tunneled) host->device link;
            # the bf16 dequantization is fused into the same (single) compile
            post = None
            if cfg.quant.enabled and compute_format() == "bf16":
                from functools import partial

                import jax.numpy as jnp

                from ..ops.quant import dequantize_tree

                post = partial(dequantize_tree, dtype=jnp.bfloat16)
            params, cp_params = _device_randomize(
                (params, cp_params), seed, post=post
            )
            model = cls(
                cfg=cfg,
                params=params,
                cp_params=cp_params,
                codec_params=jax.device_put(init_codec(cfg, seed + 2)),
                tokenizer=load_tokenizer(None, cfg.talker.vocab_size),
                name=f"synthetic-{cfg.mode}",
            )
            return model
        return apply_compute_format(
            cls(
                cfg=cfg,
                params=params,
                cp_params=cp_params,
                codec_params=init_codec(cfg, seed + 2),
                tokenizer=load_tokenizer(None, cfg.talker.vocab_size),
                name=f"synthetic-{cfg.mode}",
            )
        )

    # -- cloning frontend --------------------------------------------------

    def encode_reference(self, wav: np.ndarray) -> tuple[np.ndarray, np.ndarray | None]:
        """Reference waveform (24 kHz mono float32) -> (codes [Q, T_ref],
        speaker vector [D_talker] or None) via the checkpoint's real speech
        tokenizer when one was imported (models/speech_tokenizer.py), else
        the synthetic codec encoder. The real path returns no speaker
        vector: the published protocol conditions cloning on the reference
        CODES (+ ref text) alone — the vector row is the synthetic
        encoder's own conditioning channel."""
        import jax
        import jax.numpy as jnp

        if self.st_params is not None:
            from ..models.speech_tokenizer import st_encode, st_frames

            st_cfg = self.st_cfg
            hop = st_cfg.hop
            n = len(wav)
            T = st_frames(st_cfg, n)
            # pad to a frame bucket: one remote compile per bucket, not
            # per clip length (CLAUDE.md); all convs are causal, so
            # trailing zeros cannot change any WHOLE frame's codes (a
            # final partial frame may shift marginally vs an exact-length
            # encode — tests/test_speech_tokenizer.py pins the semantics)
            Tb = next((b for b in (64, 128, 256, 512, 1024, 2048)
                       if T <= b), -(-T // 2048) * 2048)
            padded = np.zeros(Tb * hop, dtype=np.float32)
            padded[:n] = wav
            if self._st_fn is None:
                self._st_fn = jax.jit(
                    lambda p, w: st_encode(p, st_cfg, w)
                )
            codes = self._st_fn(self.st_params, jnp.asarray(padded)[None])
            return np.asarray(codes[0])[:, :T], None

        from ..models.codec import encode_waveform, rvq_quantize, speaker_embedding

        hop = self.cfg.codec.hop
        n = len(wav)
        T = max(1, -(-n // hop))            # true frame count
        # pad the FRAME count to a bucket so the jitted encoder compiles
        # once per bucket, not once per distinct clip length (remote
        # compiles cost minutes — CLAUDE.md); the encoder is causal, so
        # trailing zero-padding cannot change the true frames' latents
        Tb = T
        for b in (64, 128, 256, 512, 1024, 2048):
            if T <= b:
                Tb = b
                break
        else:
            Tb = -(-T // 2048) * 2048
        padded = np.zeros(Tb * hop, dtype=np.float32)
        padded[:n] = wav

        if self._enc_fn is None:
            @jax.jit
            def enc(codec_params, w, true_t):
                latent = encode_waveform(codec_params, self.cfg, w)
                codes = rvq_quantize(codec_params, self.cfg, latent)
                # mask the padding frames out of the speaker pooling (the
                # mean must cover the REAL clip only)
                mask = (
                    jnp.arange(latent.shape[1]) < true_t
                )[None, :, None].astype(latent.dtype)
                spk = speaker_embedding(
                    codec_params, self.cfg, latent * mask,
                    n_frames=true_t,
                )
                return codes, spk

            self._enc_fn = enc

        codes, spk = self._enc_fn(
            self.codec_params, jnp.asarray(padded)[None], jnp.int32(T)
        )
        # trim the bucket padding's garbage codes host-side
        return np.asarray(codes[0])[:, :T], np.asarray(spk[0])


# --------------------------------------------------------------------------
# load_model
# --------------------------------------------------------------------------

def load_model(model_path: str, **kwargs) -> Qwen3TTSModel:
    """Load a model from a checkpoint directory (HF snapshot layout), or
    build a synthetic one from a ``synthetic:tiny``/``synthetic:flagship``
    spec string (used by tests, benchmarks and offline environments).
    """
    m = _SYNTH_RE.match(model_path or "")
    if m:
        size, mode = m.group(1), m.group(2) or "custom"
        cfg = {
            "tiny": lambda: configs.tiny(mode, quant=True),
            "flagship": lambda: configs.flagship(mode),
            "tiny-code2wav": lambda: configs.tiny_code2wav(mode),
            "flagship-code2wav": lambda: configs.flagship_code2wav(mode),
        }[size]()
        return Qwen3TTSModel.synthetic(cfg, seed=kwargs.get("seed", 0))

    if not os.path.isdir(model_path):
        raise FileNotFoundError(f"model path does not exist: {model_path}")

    from .weights import load_checkpoint

    return apply_compute_format(load_checkpoint(model_path, **kwargs))


# --------------------------------------------------------------------------
# generate_audio
# --------------------------------------------------------------------------

# latin enders need trailing whitespace (don't split "3.14"); CJK full-width
# enders split unconditionally — unspaced 。！？； is the norm in zh/ja text
_SENTENCE_SPLIT = re.compile(r"(?<=[.!?;])\s+|(?<=[。！？；])\s*")
_MAX_SEGMENT_CHARS = 600
_SEGMENT_GAP_S = 0.15


def _split_segments(text: str) -> list[str]:
    """Prosody-safe long-text chunking (SURVEY.md §5 long-context): split on
    sentence boundaries, packing sentences into ≤600-char segments."""
    sentences = [s for s in _SENTENCE_SPLIT.split(text.strip()) if s]
    segments: list[str] = []
    cur = ""
    for s in sentences:
        while len(s) > _MAX_SEGMENT_CHARS:  # pathological unbroken run
            if cur:
                segments.append(cur)
                cur = ""
            segments.append(s[:_MAX_SEGMENT_CHARS])
            s = s[_MAX_SEGMENT_CHARS:]
        if not cur:
            cur = s
        elif len(cur) + 1 + len(s) <= _MAX_SEGMENT_CHARS:
            cur = f"{cur} {s}"
        else:
            segments.append(cur)
            cur = s
    if cur:
        segments.append(cur)
    return segments or [""]


def _estimate_frames(text: str, frame_rate: float) -> int:
    """Frame budget heuristic: ~15 chars/sec speech, 60% headroom."""
    est_seconds = max(1.0, len(text) / 15.0)
    return int(est_seconds * frame_rate * 1.6) + 24


def prepare_segments(
    model: Qwen3TTSModel,
    text: str,
    *,
    voice: str | None = None,
    instruct: str | None = None,
    speed: float = 1.0,
    ref_audio: str | None = None,
    ref_text: str | None = None,
    max_frames: int | None = None,
) -> tuple[list, list[int]]:
    """The shared request frontend of :func:`generate_audio` and the HTTP
    daemon (``server.py``): split ``text`` into segments, encode the cloning
    reference sample once (device work), and build one (prompt, frame
    budget) pair per segment."""
    from ..runtime.prompts import build_prompt

    cfg = model.cfg
    sr = cfg.codec.sample_rate

    acoustic_codes = None
    speaker_vector = None
    if ref_audio is not None:
        from ..audio import read_wav, resample
        from ..audio.wavio import to_mono

        data, rate = read_wav(ref_audio)
        wav_ref = resample(to_mono(data), rate, sr)
        # bound the acoustic prompt (prompt bucket budget)
        max_ref_s = 30.0
        if len(wav_ref) > max_ref_s * sr:
            wav_ref = wav_ref[: int(max_ref_s * sr)]
        acoustic_codes, speaker_vector = model.encode_reference(wav_ref)

    segments = _split_segments(text)
    prompts = [
        build_prompt(
            model.tokenizer,
            cfg.mode,
            segment,
            voice=voice,
            speakers=cfg.speakers,
            speaker_tokens=(dict(cfg.talker.speaker_tokens)
                            if cfg.talker.speaker_tokens else None),
            instruct=instruct,
            speed=speed,
            ref_text=ref_text,
            acoustic_codes=acoustic_codes,
            speaker_vector=speaker_vector,
            template=model.template,
        )
        for segment in segments
    ]
    budgets = [
        max_frames if max_frames is not None else _estimate_frames(
            segment, cfg.codec.frame_rate
        )
        for segment in segments
    ]
    return prompts, budgets


def generate_audio(
    *,
    model: Qwen3TTSModel,
    text: str,
    voice: str | None = None,
    instruct: str | None = None,
    speed: float = 1.0,
    ref_audio: str | None = None,
    ref_text: str | None = None,
    output_path: str,
    max_frames: int | None = None,
    seed: int = 0,
    on_chunk: Callable[[np.ndarray], None] | None = None,
    file_name: str = "audio_000.wav",
) -> dict:
    """Synthesise ``text`` and write ``output_path/audio_000.wav``.

    The three call shapes match the reference exactly (custom.py:163-170,
    design.py:76-81, clone.py:218-224). Returns a metrics dict
    {rtf, ttfa_s, frames, audio_s, wall_s, segments} — the observability the
    reference lacks (SURVEY.md §5 metrics).
    """
    cfg = model.cfg
    sr = cfg.codec.sample_rate

    prompts, budgets = prepare_segments(
        model, text, voice=voice, instruct=instruct, speed=speed,
        ref_audio=ref_audio, ref_text=ref_text, max_frames=max_frames,
    )
    n_segments = len(prompts)

    pieces: list[np.ndarray] = []
    total_frames = 0
    ttfa = None
    wall = 0.0

    longform_mode = os.environ.get("QWEN3_TTS_LONGFORM", "serving")
    if n_segments > 1 and on_chunk is None and longform_mode == "serving":
        # long-form fast path: synthesize all segments CONCURRENTLY through
        # the continuous-batching engine — segments are independent, so a
        # 10k-char text runs at multi-stream aggregate throughput instead of
        # serial single-stream (PERF.md: 62x vs 15x on one v5e)
        import time as _time

        engine = model.serving_engine()
        import jax

        engine.key = jax.random.PRNGKey(seed)  # reproducible per call
        t0 = _time.perf_counter()
        results = engine.run(prompts, max_frames=budgets)
        # streamed chunks carry full left context (incremental codec
        # decode), so each segment's waveform is just their concatenation
        pieces = [wav for wav, _ in results]
        wall = _time.perf_counter() - t0
        total_frames = sum(s.frames for _, s in results)
        ttfa = min(
            (s.ttfa_s for _, s in results if s.ttfa_s is not None),
            default=0.0,
        )
    else:
        for seg_idx, (prompt, budget) in enumerate(zip(prompts, budgets)):
            result = model.generator.synthesize(
                prompt, max_frames=budget, seed=seed + seg_idx,
                on_chunk=on_chunk,
            )
            pieces.append(result.wav)
            total_frames += result.frames
            wall += result.wall_s
            if ttfa is None:
                ttfa = result.ttfa_s

    # decode emits device-quantized int16 PCM (ops/pcm.py); the gap must
    # match so segment concatenation stays one dtype
    gap = np.zeros(int(_SEGMENT_GAP_S * sr), dtype=pieces[0].dtype)
    out = pieces[0] if len(pieces) == 1 else np.concatenate(
        [p for pair in zip(pieces, [gap] * len(pieces)) for p in pair][:-1]
    )

    # speed contract: checkpoints that don't natively honor the speed tag
    # get host-side WSOLA time-stretching (audio/stretch.py)
    if abs(speed - 1.0) >= 1e-3 and not cfg.native_speed and len(out):
        from ..audio.stretch import time_stretch

        if out.dtype == np.int16:
            from ..ops.pcm import pcm16_to_f32

            out = pcm16_to_f32(out)
        out = time_stretch(out, float(speed), sr)

    from ..audio import write_wav

    os.makedirs(output_path, exist_ok=True)
    write_wav(os.path.join(output_path, file_name), out, sr)

    audio_s = len(out) / sr
    metrics = {
        "frames": total_frames,
        "audio_s": audio_s,
        "wall_s": wall,
        "ttfa_s": ttfa or 0.0,
        "rtf": (audio_s / wall) if wall > 0 else 0.0,
        "segments": n_segments,
        "sample_rate": sr,
    }
    from ..profiling import emit_metrics

    emit_metrics(
        "generate_audio",
        {
            "mode": cfg.mode,
            "chars": len(text),
            **{k: round(v, 4) if isinstance(v, float) else v
               for k, v in metrics.items()},
        },
    )
    return metrics
