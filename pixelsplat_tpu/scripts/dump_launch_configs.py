"""Print ready-to-paste launch commands for the standard workflows.

Counterpart of /root/reference/src/scripts/dump_launch_configs.py (which
dumps VS Code launch configs): emits the equivalent CLI invocations for
debugging (single-process, batch 1) and the five driver configurations.
"""

from __future__ import annotations

LAUNCHES = {
    "train re10k (debug)": (
        "python -m pixelsplat_tpu.main +experiment=re10k "
        "data_loader.train.num_workers=0 data_loader.train.batch_size=1 "
        "wandb.mode=disabled"
    ),
    "train re10k": "python -m pixelsplat_tpu.main +experiment=re10k",
    "eval re10k": (
        "python -m pixelsplat_tpu.main +experiment=re10k mode=test "
        "dataset/view_sampler=evaluation checkpointing.load=<ckpt>"
    ),
    "eval acid video": (
        "python -m pixelsplat_tpu.main +experiment=acid mode=test "
        "dataset/view_sampler=evaluation "
        "dataset.view_sampler.index_path=assets/evaluation_index_acid_video.json "
        "checkpointing.load=<ckpt>"
    ),
    "ablation no epipolar": (
        "python -m pixelsplat_tpu.main "
        "+experiment=re10k_ablation_no_epipolar_transformer"
    ),
    "3-view": "python -m pixelsplat_tpu.main +experiment=re10k_3_view",
    "compute metrics": (
        "python -m pixelsplat_tpu.scripts.compute_metrics +evaluation=re10k"
    ),
    "generate eval index": (
        "python -m pixelsplat_tpu.scripts.generate_evaluation_index"
    ),
}

if __name__ == "__main__":
    for name, cmd in LAUNCHES.items():
        print(f"# {name}\n{cmd}\n")
