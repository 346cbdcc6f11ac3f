"""Command-line entry points — the analog of the reference's shell
drivers (``/root/reference/run.sh`` wraps the Java mains with fixed
paths): one binary, three subcommands, each printing ONE JSON summary
line so shells and schedulers can consume the result.

    python -m wned_ray link --transcripts T --aliases A [--graph G]
        [--redirects R] --out DIR [--checkpoint-dir C] [--set k=v ...]
    python -m wned_ray increment --state CKPT --delta T --aliases A
        [--graph G] [--redirects R] --out DIR [--save-state CKPT2]
        [--set k=v ...]
    python -m wned_ray curate --docs D --out DIR [--langs en,de]
        [--min-tokens N] [--jaccard T] [--checkpoint-dir C]

``--set key=value`` overrides any ``PipelineConfig`` field; values are
parsed with the field's annotated type (ints/floats/bools/strings).
The CLI owns the Ray session (init guarded per the driver contract —
library code never calls ``ray.init``)."""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time


def _parse_overrides(pairs: list[str]):
    from wned_ray.config import PipelineConfig

    fields = {f.name: f for f in dataclasses.fields(PipelineConfig)}
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        if k not in fields:
            raise SystemExit(f"unknown PipelineConfig field {k!r}")
        default = getattr(PipelineConfig(), k)
        if isinstance(default, bool):
            out[k] = v.lower() in ("1", "true", "yes", "on")
        elif isinstance(default, int):
            out[k] = int(v)
        elif isinstance(default, float):
            out[k] = float(v)
        elif isinstance(default, str):
            out[k] = v
        else:
            # non-scalar fields (nil_model tuple, None-defaulted paths
            # with dedicated flags) cannot round-trip through a k=v
            # string — reject up front instead of crashing deep in a
            # scorer batch (code-review finding)
            raise SystemExit(
                f"{k!r} is not settable via --set (non-scalar field); "
                f"use the dedicated flag or the Python API")
    return out


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cmd_link(args) -> dict:
    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.link import run_linkage

    cfg = PipelineConfig(checkpoint_dir=args.checkpoint_dir,
                         **_parse_overrides(args.set))
    t0 = time.time()
    out = run_linkage(args.transcripts, args.aliases, args.graph, cfg,
                      redirects_path=args.redirects)
    out["clusters"].write_parquet(args.out)
    if args.save_state:
        from wned_ray.pipelines.increment import save_linkage_state

        save_linkage_state(out, args.save_state)
    return {"cmd": "link", "out": args.out,
            "clusters": out["clusters"].count(),
            "scores": out["scores"].count(),
            "saved_state": args.save_state or None,
            "sec": round(time.time() - t0, 2),
            "stage_sec": out.get("timings", {})}


def _cmd_increment(args) -> dict:
    from wned_ray.config import PipelineConfig
    from wned_ray.pipelines.increment import (load_linkage_state,
                                              run_linkage_increment,
                                              save_linkage_state)

    cfg = PipelineConfig(**_parse_overrides(args.set))
    t0 = time.time()
    base = load_linkage_state(args.state)
    out = run_linkage_increment(base, args.delta, args.aliases,
                                args.graph, cfg,
                                redirects_path=args.redirects)
    out["clusters"].write_parquet(args.out)
    if args.save_state:
        save_linkage_state(out["state"], args.save_state)
    return {"cmd": "increment", "out": args.out,
            "clusters": out["clusters"].count(),
            "delta_mentions": out["prepared"].count(),
            "saved_state": args.save_state or None,
            "sec": round(time.time() - t0, 2),
            "stage_sec": out.get("timings", {})}


def _cmd_curate(args) -> dict:
    from wned_ray.pipelines.curate import curate_corpus

    t0 = time.time()
    res = curate_corpus(args.docs, args.out,
                        lang_keep=tuple(args.langs.split(",")),
                        min_tokens=args.min_tokens,
                        jaccard_threshold=args.jaccard,
                        checkpoint_dir=args.checkpoint_dir)
    summary = {"cmd": "curate", "out": args.out,
               "sec": round(time.time() - t0, 2)}
    if isinstance(res, dict):
        summary.update({k: v for k, v in res.items()
                        if isinstance(v, (int, float, str))})
    return summary


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wned_ray", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    ln = sub.add_parser("link", help="full linkage run")
    ln.add_argument("--transcripts", required=True)
    ln.add_argument("--aliases", required=True)
    ln.add_argument("--graph", default=None)
    ln.add_argument("--redirects", default=None)
    ln.add_argument("--out", required=True)
    ln.add_argument("--checkpoint-dir", default=None)
    ln.add_argument("--save-state", default=None,
                    help="persist the full linkage state for `increment`")
    ln.add_argument("--set", action="append", metavar="key=value")
    ln.set_defaults(fn=_cmd_link)

    inc = sub.add_parser("increment", help="append a delta to a saved state")
    inc.add_argument("--state", required=True,
                     help="checkpoint dir from save_linkage_state")
    inc.add_argument("--delta", required=True)
    inc.add_argument("--aliases", required=True)
    inc.add_argument("--graph", default=None)
    inc.add_argument("--redirects", default=None)
    inc.add_argument("--out", required=True)
    inc.add_argument("--save-state", default=None)
    inc.add_argument("--set", action="append", metavar="key=value")
    inc.set_defaults(fn=_cmd_increment)

    cur = sub.add_parser("curate", help="training-data curation funnel")
    cur.add_argument("--docs", required=True)
    cur.add_argument("--out", required=True)
    cur.add_argument("--langs", default="en")
    cur.add_argument("--min-tokens", type=int, default=5)
    cur.add_argument("--jaccard", type=float, default=0.8)
    cur.add_argument("--checkpoint-dir", default=None)
    cur.set_defaults(fn=_cmd_curate)

    args = p.parse_args(argv)
    _init_ray()
    try:
        print(json.dumps(args.fn(args)))
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
