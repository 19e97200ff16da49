"""One-command checkpoint-parity evaluation against the published baselines.

Given the reference's published Lightning checkpoint (or an orbax directory
produced by tools/import_checkpoint.py), a dataset root, and an evaluation
index, this runs the full test protocol (PROBABILISTIC encoder with
gaussians_per_pixel=3, exactly as the reference's test_step encodes —
/root/reference/src/model/model_wrapper.py:163-168 — chunked rendering of
every target view, PSNR/SSIM/LPIPS, PNG dumps, benchmark JSONs) and prints
the metric table next to the published numbers with the BASELINE.md
acceptance gate (PSNR within ±0.05 dB).

This is the runbook for the acceptance gate the build environment cannot
execute (no published ckpt / dataset / egress here); with the artifacts in
hand it is one command:

    python tools/run_parity_eval.py \
        --ckpt re10k.ckpt \
        --data datasets/re10k \
        --index assets/evaluation_index_re10k.json \
        [--experiment re10k] [--output outputs/parity] [overrides ...]

Counterpart of the reference flow `python -m src.main +experiment=re10k
mode=test dataset/view_sampler=evaluation checkpointing.load=re10k.ckpt`
(/root/reference/src/main.py:128-134) plus its metric averaging
(src/model/model_wrapper.py:154-199).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Published camera-ready numbers (BASELINE.md, from the reference README).
PUBLISHED = {
    "re10k": {"psnr": 26.09, "ssim": 0.863, "lpips": 0.136},
    "acid": {"psnr": 28.27, "ssim": 0.843, "lpips": 0.146},
}
PSNR_GATE_DB = 0.05


def load_params(ckpt: Path, encoder_cfg):
    """Orbax dir or Lightning .ckpt -> Flax param tree."""
    if ckpt.is_dir():
        from pixelsplat_tpu.training.checkpoint import load_checkpoint

        state = load_checkpoint(ckpt)
        return getattr(state, "params", state["params"] if isinstance(state, dict) else state)
    from pixelsplat_tpu.interop.torch_import import load_lightning_checkpoint

    return load_lightning_checkpoint(ckpt, encoder_cfg)


def run(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, type=Path)
    p.add_argument("--data", required=True, type=Path, help="dataset root")
    p.add_argument("--index", required=True, type=Path, help="evaluation index json")
    p.add_argument("--experiment", default="re10k")
    p.add_argument("--output", default="outputs/parity", type=Path)
    p.add_argument("--chunk-size", default=32, type=int)
    p.add_argument("overrides", nargs="*", help="extra config overrides")
    a = p.parse_args(argv)

    from pixelsplat_tpu.config import load_config
    from pixelsplat_tpu.main import build_everything

    cfg = load_config(
        [
            f"+experiment={a.experiment}",
            "mode=test",
            "dataset/view_sampler=evaluation",
            f"dataset.view_sampler.index_path={a.index}",
            f"dataset.roots=[{a.data}]",
            f"test.output_path={a.output}",
            f"output_dir={a.output}",
            "wandb.mode=disabled",
            *a.overrides,
        ]
    )
    trainer = build_everything(cfg)
    params = load_params(a.ckpt, cfg.model.encoder)
    summary = trainer.test(params, chunk_size=a.chunk_size)

    published = PUBLISHED.get(a.experiment, {})
    rows = []
    for metric in ("psnr", "ssim", "lpips"):
        ours = summary.get(metric)
        ref = published.get(metric)
        delta = None if (ours is None or ref is None) else ours - ref
        rows.append((metric, ours, ref, delta))

    print()
    print(f"| metric | ours | published ({a.experiment}) | delta |")
    print("|---|---|---|---|")
    for metric, ours, ref, delta in rows:
        f = lambda x: "n/a" if x is None else f"{x:.4f}"
        print(f"| {metric} | {f(ours)} | {f(ref)} | {f(delta)} |")
    print(
        f"| scenes | {summary['num_scenes']} | - | - |\n"
        f"| overflow pairs | {summary['overflow_pairs']} | 0 | - |"
    )

    psnr_delta = rows[0][3]
    gate = None
    if psnr_delta is not None:
        gate = abs(psnr_delta) <= PSNR_GATE_DB and summary["overflow_pairs"] == 0
        print(
            f"\nacceptance gate (|dPSNR| <= {PSNR_GATE_DB} dB, zero overflow): "
            + ("PASS" if gate else "FAIL")
        )
    summary["psnr_delta"] = psnr_delta
    summary["gate"] = gate
    out = Path(a.output) / "parity_summary.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(summary, indent=2))
    print(f"summary -> {out}")
    return summary


if __name__ == "__main__":
    run()
