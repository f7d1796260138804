"""Multi-chip scaling-efficiency projection (VERDICT r4 #4).

Real multi-chip hardware does not exist in this environment (one tunneled
v5e chip), and virtual-CPU meshes measure nothing about ICI — so this
builds the defensible substitute: a per-stage analytical projection from

  * MEASURED single-chip stage times (profile_stages.py on the 1080p/500k
    bench scene — pass --stages-json to override the embedded numbers),
  * the EXACT per-slab (gaussian, tile) pair distribution of the bench
    scene, computed here by running the real binning per slab-local grid
    (the same `composite_slab` geometry the sharded step uses), and
  * public v5e ICI rates (parameterized; default 45 GB/s per link
    direction, 2 links usable in a 1D ring — override with --ici-gbps).

Model (gsjax/parallel/step.py's actual structure, (data, tile) mesh):

  t(D, T) = t_replicated                       # preprocess fwd+vjp, N-rate
                                               # binning parts, adam update
          + t_slab(T) * imbalance(T)           # instance-rate binning +
                                               # composite kernels + grad
                                               # reduction, scaled by the
                                               # MAX per-slab share
          + t_psum_tile(T)                     # 9 floats/Gaussian raster
                                               # cotangent all-reduce
          + t_psum_data(D)                     # full param grad all-reduce
                                               # (59 floats/Gaussian at SH3)
  throughput(D, T) = D * pixels / t(D, T)      # data axis batches cameras
  efficiency(D, T) = throughput / (D*T * pixels / t(1,1))

Writes artifacts/scaling_projection.json. The per-slab distribution is a
measurement (exact counts from the real binning); the ICI terms are clearly
labeled assumptions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, "/root/repo")

# The pair COUNTS are backend-independent integers; never burn (or fight
# over) the tunneled TPU for them.
os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins axon; override

import numpy as np

# Measured on the real v5e chip via profile_stages.py (1080p, 500k
# gaussians, budgets 1179648/524288) — r5 re-measurement; see
# artifacts/tpu_queue_r5/. Keys must cover the whole fwd+bwd step.
DEFAULT_STAGES_MS = {
    # replicated per device (N-rate / capacity-rate work):
    "preprocess_fwd_bwd": 2.78,
    "binning_n_rate": 6.9,  # depth sort + (N,8) permute + rect math
    "adam_update": 1.0,  # capacity-rate optimizer math (est., <=1 ms)
    # sharded with the slab (instance-rate work):
    "binning_inst_rate": 14.2,  # expansions, row gather, tile sort, starts
    "permute_build_inst": 9.67,
    "composite_fwd": 26.64,
    "composite_bwd": 31.00,
    "grad_reduction": 12.97,
    "loss_and_misc": 4.0,  # halo-local L1+SSIM etc. (slab-rate)
}

N_GAUSS = 500_000
WIDTH, HEIGHT = 1920, 1080
RASTER_COT_FLOATS = 9  # mean_pix 2 + conic 3 + rgb 3 + opacity 1
PARAM_GRAD_FLOATS = 59  # xyz 3 + f_dc 3 + f_rest 45 + scale 3 + rot 4 + op 1


def slab_pair_counts(n_tile_list):
    """Exact per-slab (gaussian, tile) pair counts for the bench scene, by
    running the real slab-local binning the sharded step uses (CPU fallback
    path — the counts are backend-independent integers)."""
    import jax
    import jax.numpy as jnp

    from gsjax.config import RasterConfig
    from gsjax.parallel.render import slab_rows
    from gsjax.render.binning import bin_gaussians, num_tiles
    from gsjax.render.preprocess import preprocess
    from gsjax.synthetic import look_at_origin_camera, random_scene

    params, aux = random_scene(
        N_GAUSS, capacity=N_GAUSS, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    proj = preprocess(
        xyz=params.xyz, sh=params.get_features(),
        opacity=params.get_opacity(), scaling=params.get_scaling(),
        rotation=params.rotation, camera=camera, active_sh_degree=3,
        alive=aux.alive,
    )
    cfg = RasterConfig(tile_w=32, tile_h=32, max_instances=128,
                       max_rows=1 << 20, interpret=True)
    out = {}
    tiles_x, _ = num_tiles(HEIGHT, WIDTH, cfg.tw, cfg.th)
    w_pad = tiles_x * cfg.tw
    for n_tile in n_tile_list:
        rows = slab_rows(HEIGHT, n_tile, cfg.th)
        counts = []
        for d in range(n_tile):
            py0 = jnp.float32(d * rows * cfg.th)
            mean_local = proj.mean_pix - jnp.stack(
                [jnp.zeros(()), py0]
            )[None, :]
            # num_instances/num_rows are computed before any budget clamp,
            # so a minimal (128) instance budget keeps the fallback expansion cheap while
            # the COUNTS stay exact.
            b = bin_gaussians(
                mean_local, proj.depth, proj.ext, proj.conic, proj.qmax,
                rows * cfg.th, w_pad, cfg, packed_paths=False,
            )
            counts.append(int(b.num_instances))
        out[n_tile] = counts
    return out


def ring_allreduce_ms(bytes_total: float, n: int, link_gbps: float) -> float:
    """Ring all-reduce wall time: 2(n-1)/n * bytes over one link direction."""
    if n <= 1:
        return 0.0
    return 2.0 * (n - 1) / n * bytes_total / (link_gbps * 1e9) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages-json", default=None,
                    help="JSON dict overriding DEFAULT_STAGES_MS")
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="assumed per-direction ICI link rate (GB/s); "
                         "v5e public spec: 1600 Gbps/chip aggregate across "
                         "4 links -> ~50 GB/s per direction per link; 45 "
                         "leaves protocol headroom")
    ap.add_argument("--out", default="artifacts/scaling_projection.json")
    args = ap.parse_args()

    stages = dict(DEFAULT_STAGES_MS)
    if args.stages_json:
        stages.update(json.load(open(args.stages_json)))

    t_repl = (stages["preprocess_fwd_bwd"] + stages["binning_n_rate"]
              + stages["adam_update"])
    t_slab1 = (stages["binning_inst_rate"] + stages["permute_build_inst"]
               + stages["composite_fwd"] + stages["composite_bwd"]
               + stages["grad_reduction"] + stages["loss_and_misc"])
    t11 = t_repl + t_slab1

    tile_meshes = [2, 4, 8]
    print("computing exact per-slab pair counts (CPU binning)...", flush=True)
    slabs = slab_pair_counts(tile_meshes)
    total_pairs = {t: sum(c) for t, c in slabs.items()}

    px = WIDTH * HEIGHT
    cot_bytes = RASTER_COT_FLOATS * 4 * N_GAUSS
    grad_bytes = PARAM_GRAD_FLOATS * 4 * N_GAUSS

    results = []
    for d, t in [(1, 1), (1, 2), (1, 4), (1, 8), (2, 1), (4, 1), (2, 2),
                 (2, 4)]:
        if t in slabs:
            share = max(slabs[t]) / total_pairs[t]
        elif t == 1:
            share = 1.0
        else:
            share = 1.0 / t
        imbalance = share * t  # 1.0 = perfectly balanced
        t_step = (
            t_repl
            + t_slab1 * share
            + ring_allreduce_ms(cot_bytes, t, args.ici_gbps)
            + ring_allreduce_ms(grad_bytes, d, args.ici_gbps)
        )
        thru = d * px / (t_step / 1e3)
        eff = thru / (d * t * px / (t11 / 1e3))
        results.append({
            "mesh": {"data": d, "tile": t},
            "max_slab_pair_share": round(share, 4),
            "imbalance_factor": round(imbalance, 3),
            "tile_psum_ms": round(
                ring_allreduce_ms(cot_bytes, t, args.ici_gbps), 3),
            "data_psum_ms": round(
                ring_allreduce_ms(grad_bytes, d, args.ici_gbps), 3),
            "step_ms": round(t_step, 2),
            "throughput_px_per_s": round(thru, 0),
            "efficiency": round(eff, 3),
        })
        print(f"mesh (data={d}, tile={t}): step {t_step:.1f} ms, "
              f"eff {eff:.3f}", flush=True)

    out = {
        "kind": "analytical projection from measured single-chip stage "
                "times + exact slab pair counts + assumed ICI rates "
                "(NO multi-chip hardware exists in this environment)",
        "scene": f"bench 1080p / {N_GAUSS} gaussians (bench.py scene)",
        "measured_stage_ms": stages,
        "single_chip_step_ms": round(t11, 2),
        "slab_pair_counts": {str(k): v for k, v in slabs.items()},
        "assumptions": {
            "ici_link_gbps_per_direction": args.ici_gbps,
            "collective_model": "ring all-reduce, 2(n-1)/n * bytes / link",
            "tile_axis_traffic": f"{RASTER_COT_FLOATS} f32/gaussian raster "
                                 "cotangents (two-stage backward)",
            "data_axis_traffic": f"{PARAM_GRAD_FLOATS} f32/gaussian param "
                                 "grads (SH3)",
            "replicated_work": "preprocess fwd+vjp, N-rate binning, adam",
        },
        "projection": results,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
