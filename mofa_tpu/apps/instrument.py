"""CLI observability: per-phase wall-clock + optional device trace.

A new capability over the reference (its only progress reporting is tqdm,
SURVEY.md §5). Every inference CLI gains:

  --timings        print a per-phase wall-clock table (device-fenced) on exit
  --trace_dir DIR  capture a jax.profiler trace of the generation phases
                   (open in XProf/Perfetto/TensorBoard)
"""

from __future__ import annotations

import contextlib

from mofa_tpu.utils.profiling import PhaseTimer, trace


def add_observability_args(parser):
    parser.add_argument("--timings", action="store_true",
                        help="print per-phase wall-clock timings on exit")
    parser.add_argument("--trace_dir", default=None,
                        help="write a jax.profiler trace here (XProf/Perfetto)")
    return parser


@contextlib.contextmanager
def observe(args):
    """Yields a PhaseTimer; prints the phase table when --timings is set."""
    timer = PhaseTimer()
    try:
        yield timer
    finally:
        if getattr(args, "timings", False):
            print(timer.report())


def maybe_trace(args):
    """Profiler trace context for the GENERATION phase only — tracing the
    whole run (minutes of compile) makes stop_trace write unboundedly
    large files."""
    if getattr(args, "trace_dir", None):
        return trace(args.trace_dir)
    return contextlib.nullcontext()
