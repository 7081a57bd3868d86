#!/usr/bin/env python3
"""Qwen3-TTS TPU — interactive terminal app (entry point).

TPU-native counterpart of the reference entry point
(/root/reference/app.py): environment gate + warning suppression
app.py:14-31, sys.path bootstrap app.py:38-40, engine import check with a
friendly panel app.py:49-59, mode menu with model-presence dots app.py:63-102,
crash-resilient REPL loop app.py:107-117.

Where the reference refuses to run off Apple Silicon, this app prefers a TPU
backend but degrades to CPU with a warning — the JAX engine runs anywhere.
"""

from __future__ import annotations

import os
import sys
import warnings

# --- environment setup before heavy imports ---------------------------------
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")
warnings.filterwarnings("ignore")

# sys.path bootstrap so `src/` imports work when run from a checkout
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "src")
if _SRC not in sys.path:
    sys.path.insert(0, _SRC)

# QWEN3_TTS_CPU forces the CPU backend via jax.config before any backend
# initialisation (the TPU plugin preloads through sitecustomize, so a plain
# JAX_PLATFORMS env var is too late) — same escape hatch as examples/ and
# serve.py. Useful when the remote TPU service is unreachable or wedged.
_CPU_FORCED = (
    os.environ.get("QWEN3_TTS_CPU", "0") not in ("", "0")
    or os.environ.get("JAX_PLATFORMS") == "cpu"
)
if _CPU_FORCED:
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # engine check below reports the real problem
        pass

from qwen3_tts_tpu import config  # noqa: E402
from qwen3_tts_tpu.io import get_smart_path  # noqa: E402
from qwen3_tts_tpu.sessions import (  # noqa: E402
    run_clone_manager,
    run_custom_session,
    run_design_session,
)
from qwen3_tts_tpu.ui import (  # noqa: E402
    BackSignal,
    clear_screen,
    console,
    instant_menu_choice,
    print_banner,
)


def _engine_check() -> bool:
    """Verify the inference engine imports (JAX present). Friendly panel on
    failure — parity with the reference's MLX check (app.py:49-59)."""
    try:
        import jax  # noqa: F401

        return True
    except Exception as exc:  # pragma: no cover - environment specific
        from rich.panel import Panel

        console.print(
            Panel(
                f"The JAX engine could not be imported:\n[err]{exc}[/err]\n\n"
                "Install JAX for your platform (TPU: jax[tpu]) and retry.",
                title="Engine unavailable",
                border_style="err",
            )
        )
        return False


def _backend_note() -> str:
    try:
        import jax

        kind = jax.devices()[0].platform
        n = len(jax.devices())
        return f"{n}× {kind}"
    except Exception:
        return "cpu (no accelerator detected)"


def main_menu() -> None:
    clear_screen()
    print_banner()
    console.print(f"[dim]backend: {_backend_note()}[/dim]\n")
    for key, spec in config.MODELS.items():
        present = get_smart_path(spec.folder) is not None
        dot = "[ok]●[/ok]" if present else "[dim]○[/dim]"
        console.print(
            f"  [key]{key}[/key]. {spec.icon} {spec.name:14s} {dot} "
            f"[dim]{spec.description}[/dim]"
        )
    console.print("  [key]q[/key]. Quit\n")

    choice = instant_menu_choice({"1", "2", "3", "q"}, allow_escape=False)
    if choice == "q":
        raise SystemExit(0)
    spec = config.MODELS[choice]
    if spec.mode == "custom":
        run_custom_session(choice)
    elif spec.mode == "design":
        run_design_session(choice)
    elif spec.mode == "clone_manager":
        run_clone_manager(choice)


def main() -> None:
    if not _engine_check():
        raise SystemExit(1)
    if not _CPU_FORCED:
        # the app owns an engine on the shared TPU service for the whole
        # session: take the host-wide device lock so a benchmark or
        # measurement step can't allocate a second engine into the same
        # HBM and wedge the service (CLAUDE.md). Short wait — interactive.
        from qwen3_tts_tpu.device_lock import device_lock

        wait = float(os.environ.get("QWEN3_TTS_DEVICE_LOCK_WAIT_S", 120))
        if not device_lock(wait_s=wait, label="app"):
            console.print(
                "[err]The TPU device is busy (another engine-owning "
                "process holds /tmp/qwen3_tts_device.lock).[/err]\n"
                "Retry later, or run on CPU with QWEN3_TTS_CPU=1."
            )
            raise SystemExit(1)
    os.makedirs(config.BASE_OUTPUT_DIR, exist_ok=True)
    while True:
        try:
            main_menu()
        except SystemExit:
            raise
        except (KeyboardInterrupt, EOFError):
            console.print("\n[dim]bye[/dim]")
            raise SystemExit(0)
        except BackSignal:
            continue
        except Exception as exc:  # resilient loop (reference app.py:110-115)
            console.print(f"[err]Unexpected error:[/err] {exc}")
            continue


if __name__ == "__main__":
    main()
