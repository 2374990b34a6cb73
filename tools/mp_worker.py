"""Multi-process DP training worker (one rank of a 2-process CPU launch).

The executable half of the multi-host story: tests/test_multiprocess.py
spawns two of these with a localhost coordinator, each owning one virtual
CPU device, and the Experiment runner trains a real (tiny) model with its
batch sharded across the cross-process mesh — gradient all-reduce over gloo,
rank-0-only file I/O.  Counterpart of the reference toolkits' DDP launcher
(BasicSR_master/basicsr/utils/dist_util.py:28-57) executed for real rather
than mirrored in structure only.

Usage:
  python tools/mp_worker.py --process-id I --num-processes N --port P \
      --cwd DIR --data-root DIR --result OUT.json
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--cwd", required=True, help="per-rank working directory")
    ap.add_argument("--data-root", required=True, help="shared dataset root")
    ap.add_argument("--result", required=True, help="where to dump the JSON result")
    args = ap.parse_args()

    # backend must be pinned before jax initializes; one virtual CPU device
    # per process so the 2-process mesh is 2 global devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=1")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")  # the axon plugin overrides env
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from sisr_tpu.parallel.mesh import initialize_distributed, process_zero

    initialize_distributed(coordinator_address=f"localhost:{args.port}",
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert process_zero() == (args.process_id == 0)

    os.chdir(args.cwd)
    from sisr_tpu.experiments.hitsir_pro_experiment import hitsir_pro_experiment

    exp = hitsir_pro_experiment(
        is_test=False,
        loss="l1",
        is_mult_size_conv_feat_extract=True,
        is_channel_spatial_attn=True,
        is_fusion=True,
        epochs=1,
        is_augment=True,
        batch_size=2,
        test_model_name="best_psnr_ssim_lpips_model.pth",
        embed_dim=20,
        base_win_size=[4, 4],
        depths=[2],
        num_heads=[2],
        mlp_ratio=2,
        upsampler="nearest+conv",
        hier_win_ratios=[0.5, 1],
        data_root=args.data_root,
        train_data_name_list=["setA"],
        eval_data_name_list=["setB"],
        test_data_name_list=["setB"],
        progress=False,
        eval_tile=64,
        eval_tile_overlap=8,
        loader_worker_type="thread",
        n_devices=args.num_processes,
    )

    result = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "loss": float(exp.epoch_loss.avg),
        "psnr": float(exp.epoch_psnr.avg),
        "param_sum": float(sum(float(abs(x).sum())
                               for x in jax.tree.leaves(
                                   jax.device_get(exp.state.params)))),
    }
    with open(args.result, "w") as f:
        json.dump(result, f)
    print(f"[rank {args.process_id}] done: {result}", flush=True)


if __name__ == "__main__":
    main()
