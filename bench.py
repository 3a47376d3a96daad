"""Benchmark: hash-NeRF training throughput on the attached TPU chip.

Measures the north-star metric (BASELINE.md): training rays/sec at
128 samples/ray — the full fused train step including on-device ray
generation, hash encode, MLP, compositing, loss, backward and all
optimizer updates.

Prints ONE JSON line.  The headline {"metric", "value", "unit",
"vs_baseline"} is the TPU-tuned steady-state operating point (stochastic
packed gathers + converged occupancy culling — the Instant-NGP operating
point); a "modes" dict carries the graded configurations so the headline
cannot be mistaken for the reference-semantics speed:

  exact_oracle     reference-exact fp32 corner interpolant, no
                   culling — the CORRECTNESS ORACLE, not a recommended
                   trainable mode: exact trilerp costs 256 tile-priced
                   lookups/point fwd (+ the same scattered back), which
                   the chip's ~150-200M lookups/s random-access ceiling
                   floors at ~2k rays/s regardless of implementation
  exact_packed     the fastest EXACT-SEMANTICS trainable mode: exact
                   8-corner trilerp through packed bf16 word reads
                   (2x fewer lookups) with the exact per-corner scatter
                   VJP — bf16-rounded features, the TPU analog of the
                   reference's own fp16-autocast training
                   (cfg.packed_exact_train)
  stoch_packed     unbiased stochastic-corner + packed bf16 pairs,
                   no culling
  steady_state     stoch_packed + converged occupancy + compaction
                   (the headline)
  int8_dense       L=8/F=4 int8 words + dense MXU coarse levels +
                   occupancy compaction (fewest lookups per sample)
  int8_dense_guided  int8_dense with occupancy-GUIDED inverse-CDF
                   sample placement (64 probes, no top-K compact block)
  int8_dense_guided_k32  guided placement with a 32-sample budget —
                   the quality matrix shows 32 guided samples match 48
                   on holdout PSNR at the same wall-clock
  int8_dense_guided_k32_scan8  the same operating point with 8
                   optimizer steps fused into ONE dispatch
                   (train_step_multi lax.scan; bit-exact vs sequential
                   steps) — amortizes the per-dispatch/sync floor
  cp_guided_k32_scan8  the CP low-rank factor-line encoder
                   (ops/lowrank.py): fine levels as rank-16 factor
                   lines evaluated by block-diagonal MXU matmuls —
                   zero gathers/scatters in the encoder (the only
                   random access left is the occupancy probes).  On
                   TPU the two-hot matmuls run as the VMEM-resident
                   Pallas kernel (ops/cp_pallas.py, cp_impl="auto"):
                   the XLA formulation is HBM-bound on the two-hot
                   matrix (measured 211 ms fwd+bwd at N=1.05M vs the
                   kernel's 107 ms — roofline_cp_r16.json,
                   pallas_ab.json)
  cp_r32_guided_k32_scan8  the same operating point at rank 32 — the
                   QUALITY flagship (33.5-36.4 dB holdout vs int8's
                   30.0, qm_cp*.json); slower per step (encode FLOPs
                   scale with R) but the best PSNR-per-wall-clock

Guided modes use the default unbiased mass-dt estimator (rate-neutral
vs clipped dt in a time-adjacent A/B; +0.3 dB at the 240s quality
budget and +0.78 dB at convergence, docs/PERF_NOTES.md).

Every mode trains the same 32-dim encoding at reference scale
(T=2**16, N_max=2048) and 128 samples/ray.
"""

import json
import time

import jax
import jax.numpy as jnp


def build_mode(name, cfg, batch, scan=1):
    from human_body_reconstruction_tpu.data import synthetic
    from human_body_reconstruction_tpu.models import mlp as mlp_lib
    from human_body_reconstruction_tpu.ops import hash_encoding as he
    from human_body_reconstruction_tpu.ops import occupancy
    from human_body_reconstruction_tpu.ops import rays as rays_lib
    from human_body_reconstruction_tpu.train import state as state_lib
    from human_body_reconstruction_tpu.train import step as step_lib

    ds = synthetic.make_dataset(n_views=4, H=64, W=64)
    lo, hi = rays_lib.scene_bounds(ds["H"], ds["W"], ds["K"], ds["c2ws"],
                                   ds["near"], ds["far"])
    scene = {"mu": lo, "sigma": jnp.sqrt(jnp.sum((hi - lo) ** 2)),
             "min_bound": lo, "max_bound": hi}
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    params = {
        **he.init_encoder(k1, cfg.hash),
        "mlp": mlp_lib.init_mlp3d(k2, cfg.mlp, cfg.hash.out_dim,
                                  cfg.dir_enc.out_dim),
    }
    occ = None
    occ_frac = 1.0
    if cfg.render.occupancy:
        # converged culling grid from the analytic scene density (what the
        # trainer's periodic updates converge to in steady state)
        occ = occupancy.init_grid(cfg.render.occupancy_resolution,
                                  threshold=0.5)
        for k in range(4):
            occ = occupancy.update(
                occ, lambda p: synthetic.blob_field(p)[1],
                jax.random.PRNGKey(k), scene["mu"], scene["sigma"],
                num_cells=cfg.render.occupancy_resolution ** 3)
        occ_frac = float(occupancy.occupied_fraction(occ))
    state, tx = state_lib.create_train_state(params, cfg.train, 1000,
                                             occ=occ)
    key = jax.random.PRNGKey(0)

    def run_step(state):
        if scan > 1:
            # fused multi-step dispatch: one sync per `scan` optimizer
            # steps (amortizes the ~35 ms tunnel dispatch+sync floor)
            return step_lib.train_step_multi(state, scene, ds["images"],
                                             ds["c2ws"], ds["K"], key, cfg,
                                             tx, batch, scan)
        return step_lib.train_step(state, scene, ds["images"], ds["c2ws"],
                                   ds["K"], key, cfg, tx, batch)

    return state, run_step, occ_frac


def time_mode(name, cfg, batch, iters, scan=1):
    state, run_step, occ_frac = build_mode(name, cfg, batch, scan)
    # Warmup / compile.  Timings force a host sync every step (through
    # the remote-execution tunnel of this environment, block_until_ready
    # alone can return before the work is actually done).
    for _ in range(2):
        state, metrics = run_step(state)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = run_step(state)
        float(metrics["loss"])
    dt = time.perf_counter() - t0
    return batch * iters * scan / dt, occ_frac


def cp_step_roofline(cfg, rate, compact_samples, peak_tflops):
    """Analytic FLOP accounting + achieved MFU for a CP-mode train step.

    Uses the same model as scripts/tpu_roofline_cp.py (analytic, NOT
    compiled.cost_analysis — that undercounts lax.map/while bodies by
    the trip count, docs/PERF_NOTES.md round 3): the encode's two-hot
    matmuls are dense (N, sumG) x (sumG, C) per axis with C = L*R
    (the block-diagonal zeros ride the MXU for free); backward adds
    the dW and dM products (~2x fwd).  MLP FLOPs are <5% at r>=16 and
    excluded, so this is the encode-only MFU — the number the measured
    ~380k rays/s FLOP-floor statement in docs/PERF_NOTES.md refers to.
    """
    from human_body_reconstruction_tpu.ops import cp_pallas, lowrank
    sizes = lowrank.cp_line_sizes(cfg.hash)
    c = len(sizes) * cfg.hash.cp_rank
    flops_pt = 3 * (2 * 3 * sum(sizes) * c)  # fwd + ~2x fwd backward
    # The Pallas kernel executes the layout-PADDED shapes (row layout
    # per cfg.hash.cp_layout — "tight" executes ~13.5% fewer rows than
    # the original per-segment 128 alignment; C padded to a 128
    # multiple — the padding the pad-free-rank modes r21/r42 exploit),
    # so MFU is reported against the executed-padded FLOPs; the
    # analytic exact count rides along as *_exact (ADVICE r3).
    _, _, total_pad = cp_pallas.get_layout(
        sizes, getattr(cfg.hash, "cp_layout", "tight"))
    c_pad = -(-c // 128) * 128
    flops_pt_pad = 3 * (2 * 3 * total_pad * c_pad)
    tflops = flops_pt * rate * compact_samples / 1e12
    tflops_pad = flops_pt_pad * rate * compact_samples / 1e12
    return {"flops_per_point_fwd_bwd": flops_pt_pad,
            "achieved_tflops": round(tflops_pad, 1),
            "mfu": round(tflops_pad / peak_tflops, 3),
            "flops_per_point_fwd_bwd_exact": flops_pt,
            "achieved_tflops_exact": round(tflops, 1),
            "mfu_exact": round(tflops / peak_tflops, 3)}


def _wait_for_devices(attempts=4, delay_s=90):
    """The remote-TPU tunnel occasionally drops; give it a few minutes
    to come back before the (unattended) bench run gives up."""
    import sys
    for i in range(attempts):
        try:
            return jax.devices()
        except Exception as e:
            if i == attempts - 1:
                raise
            print(f"device probe failed ({e!r}); retry {i + 1}/"
                  f"{attempts - 1} in {delay_s}s", file=sys.stderr,
                  flush=True)
            time.sleep(delay_s)


def main():
    from human_body_reconstruction_tpu.ops import dense_grid
    from human_body_reconstruction_tpu.utils import config as C

    import argparse
    import sys
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", type=str, default="",
                    help="comma-separated subset of modes to run (default "
                         "all); the headline is still picked from the "
                         "quality-validated candidates that ran")
    ap.add_argument("--out", type=str, default="BENCH_local_r5.json",
                    help="also write the result JSON here (VERDICT r4 "
                         "item 9: the driver's stdout tail is truncated "
                         "at 2 KB, which ate the round-4 headline line)")
    args = ap.parse_args()
    print("devices:", _wait_for_devices(), file=sys.stderr, flush=True)
    num_samples = 128
    render_plain = C.RenderConfig(num_samples=num_samples)
    render_occ = C.RenderConfig(num_samples=num_samples, occupancy=True,
                                occupancy_resolution=128, compact_samples=48)

    h16 = dict(num_levels=16, features_per_level=2)
    int8_hash = C.HashConfig(num_levels=8, features_per_level=4, n_min=16,
                             n_max=2048, stochastic_train=True, packed=True,
                             pack_format="int8", grad_subsample=True,
                             hw_rng=True, dense_levels=0)
    import dataclasses
    int8_hash = dataclasses.replace(
        int8_hash, dense_levels=dense_grid.auto_dense_levels(int8_hash))
    cp_hash = C.HashConfig(num_levels=8, n_min=16, n_max=2048,
                           variant="cp", cp_rank=16)
    cp_hash = dataclasses.replace(
        cp_hash, dense_levels=dense_grid.auto_dense_levels(cp_hash))

    modes = {
        "exact_oracle": (C.PipelineConfig(
            hash=C.HashConfig(**h16), render=render_plain,
            train=C.TrainConfig(ray_batch=8192)), 8192, 4),
        "exact_packed": (C.PipelineConfig(
            hash=C.HashConfig(**h16, packed=True,
                              packed_exact_train=True),
            render=render_plain,
            train=C.TrainConfig(ray_batch=8192)), 8192, 4),
        "stoch_packed": (C.PipelineConfig(
            hash=C.HashConfig(**h16, stochastic_train=True, packed=True,
                              grad_subsample=True, hw_rng=True),
            render=render_plain,
            train=C.TrainConfig(ray_batch=16384)), 16384, 8),
        "steady_state": (C.PipelineConfig(
            hash=C.HashConfig(**h16, stochastic_train=True, packed=True,
                              grad_subsample=True, hw_rng=True),
            render=render_occ,
            train=C.TrainConfig(ray_batch=32768)), 32768, 20),
        "int8_dense": (C.PipelineConfig(
            hash=int8_hash, render=render_occ,
            train=C.TrainConfig(ray_batch=32768)), 32768, 20),
        # occupancy-GUIDED placement: drops the top-K compact block
        # (its gather chain is a large share of the compacted step) and
        # probes at 64 intervals instead of 128 lookups per sample ladder
        "int8_dense_guided": (C.PipelineConfig(
            hash=int8_hash,
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64),
            train=C.TrainConfig(ray_batch=32768)), 32768, 20),
        # K-budget tuning (quality matrix: 32 guided samples match the
        # 48-sample holdout PSNR at the same wall-clock — placement
        # resolution, not sample count, is the quality lever here)
        "int8_dense_guided_k32": (C.PipelineConfig(
            hash=int8_hash,
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32),
            train=C.TrainConfig(ray_batch=32768)), 32768, 20, 1),
        # same operating point, 8 optimizer steps fused into one dispatch
        # (train_step_multi): amortizes the per-dispatch/sync overhead
        # that is otherwise ~20% of a step through the remote tunnel
        "int8_dense_guided_k32_scan8": (C.PipelineConfig(
            hash=int8_hash,
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32),
            train=C.TrainConfig(ray_batch=32768)), 32768, 4, 8),
        # CP low-rank factor-line encoder (ops/lowrank.py): the fine
        # levels are rank-16 factor lines evaluated as block-diagonal
        # MXU matmuls — ZERO random gathers forward and ZERO scatters
        # backward; the only remaining random memory access in the step
        # is the 64 occupancy probes per ray
        # cp modes carry the factor-line TV of the recommended operating
        # point (the off-orbit generalisation fix, qm_r3_textured2.json)
        # — pure elementwise work on the lines, rate-neutral
        "cp_guided_k32_scan8": (C.PipelineConfig(
            hash=cp_hash,
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # rank-32 quality flagship at the same operating point
        "cp_r32_guided_k32_scan8": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=32),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # pad-free rank bump: the kernel's padded FLOPs scale with
        # roundup(L_fine*R, 128), not R — rank 21 (C=126) costs rank
        # 16's FLOPs with +31% capacity (quality-validated at 32.13 dB
        # mean 4-pose holdout vs r16's 31.83 at the SAME 156k in-trainer
        # rate, qm_r3_textured4.json)
        "cp_r21_guided_k32_scan8": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=21),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # stratified inverse-CDF placement (occ_stratified): one draw
        # per 1/K CDF stratum — lower-variance placement (+1.5 dB on
        # the 4-pose holdout at the r32 point, qm_r3_textured4.json)
        # AND skips the per-ray sample sort (+10% step rate measured
        # in-trainer)
        "cp_r21_guided_k32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=21),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        "cp_r32_guided_k32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=32),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=32,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # K-budget cut at the flagship point: 24 guided samples save
        # 35 ms/step and 32 occupancy probes save 7 ms
        # (step_ablate_r4.json); headline candidacy is gated on the
        # qm_r4_kprobe.json quality runs (>=33 dB textured holdout)
        "cp_r21_guided_k24_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=21),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=64, compact_samples=24,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # probes-32 at the FULL K=32 budget: 33.58 dB mean 4-pose
        # textured holdout (qm_r4_kprobe.json) — passes the >=33 dB
        # headline gate that the K=24 cuts miss (32.94-32.96), while
        # keeping the -7 ms/step probe saving; round-4 headline
        # candidate and the new preset default (occ_probes=32)
        "cp_r21_guided_k32_p32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=21),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=32, compact_samples=32,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        "cp_r21_guided_k24_p32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, cp_rank=21),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=32, compact_samples=24,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # ΣG-cut ladder (round 5): n_max 1024 over 7 levels halves the
        # CP kernel's contraction width (4096 -> 2048 tight rows) — the
        # lever the width-independence analysis points at: the W build
        # cost is ∝ N·ΣG with NO rank dependence, and the matmul pays a
        # C_pad=128 lane floor, so rank cuts are free but ΣG cuts are
        # not.  r25 keeps C=125 pad-free; r50 (C_pad 256) restores the
        # matmul width as quality insurance.  Headline candidacy gated
        # on the qm_r5 textured holdout (>= 33 dB bar).
        "cp_n1024_r25_guided_k32_p32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, num_levels=7, n_max=1024,
                                     cp_rank=25),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=32, compact_samples=32,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        "cp_n1024_r50_guided_k32_p32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, num_levels=7, n_max=1024,
                                     cp_rank=50),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=32, compact_samples=32,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
        # intermediate ladder (finest line 1450, ΣG -33%): the middle
        # rate/resolution point; headline candidacy gated on qm_r5
        "cp_n1448_r25_guided_k32_p32_scan8_strat": (C.PipelineConfig(
            hash=dataclasses.replace(cp_hash, num_levels=7, n_max=1448,
                                     cp_rank=25),
            render=dataclasses.replace(render_occ, occ_guided=True,
                                       occ_probes=32, compact_samples=32,
                                       occ_stratified=True),
            train=C.TrainConfig(ray_batch=32768,
                                cp_tv_weight=1e-2)), 32768, 4, 8),
    }

    if args.modes:
        keep = args.modes.split(",")
        unknown = [m for m in keep if m not in modes]
        if unknown:
            raise SystemExit(f"unknown modes {unknown}; have {list(modes)}")
        modes = {k: v for k, v in modes.items() if k in keep}

    devkind = jax.devices()[0].device_kind.lower().replace(" ", "")
    peak = {"v4": 275.0, "v5p": 459.0, "v6e": 918.0}.get(
        next((k for k in ("v6e", "v5p", "v4") if k in devkind), ""), 197.0)

    results = {}
    occ_fracs = {}
    rooflines = {}
    for name, spec in modes.items():
        cfg, batch, iters = spec[:3]
        scan = spec[3] if len(spec) > 3 else 1
        rate, occ_frac = time_mode(name, cfg, batch, iters, scan)
        results[name] = round(rate, 1)
        occ_fracs[name] = round(occ_frac, 3)
        if cfg.hash.variant == "cp":
            rooflines[name] = cp_step_roofline(
                cfg, rate, cfg.render.compact_samples, peak)
        # checkpoint after every mode: a killed/timed-out run still
        # leaves its measurements on disk (the final write replaces
        # this with the full payload + headline)
        try:
            with open(args.out, "w") as f:
                json.dump({"partial": True, "modes": results,
                           "occ_fracs": occ_fracs}, f)
        except OSError:
            pass

    # headline candidates are quality-validated operating points ONLY
    # (cp_guided_k32_scan8 validated by qm_cp.json / qm_cp_sweep.json:
    # 32.0-33.5 dB holdout at the 240 s budget vs the int8 flagship's
    # 30.0 — CP is the quality flagship; int8 stays the rays/s leader)
    candidates = ("steady_state", "int8_dense", "int8_dense_guided",
                  "int8_dense_guided_k32", "int8_dense_guided_k32_scan8",
                  "cp_guided_k32_scan8", "cp_r32_guided_k32_scan8",
                  "cp_r21_guided_k32_scan8",
                  "cp_r21_guided_k32_scan8_strat",
                  "cp_r32_guided_k32_scan8_strat",
                  # qm_r4_kprobe.json: 33.58 dB at p32/K=32 — quality
                  # bar held, so the probe cut is headline-eligible
                  "cp_r21_guided_k32_p32_scan8_strat",
                  # qm_r5_n1024.json: 33.81 dB (then the record) — the
                  # sum_G-cut r50 point passes the >=33 dB gate; the
                  # faster r25 point (32.66) does NOT and stays out
                  "cp_n1024_r50_guided_k32_p32_scan8_strat",
                  # qm_r5_n1448.json: 33.84 dB — the intermediate
                  # ladder passes the gate with the best holdout yet at
                  # +16% in-trainer rate over the r21 flagship
                  "cp_n1448_r25_guided_k32_p32_scan8_strat")
    best = max((m for m in candidates if m in results), key=results.get)
    headline = results[best]
    payload = {
        "metric": f"train_rays_per_sec_chip@{num_samples}samples"
                  f"_{best}_occ{occ_fracs[best]:.2f}",
        "value": headline,
        "unit": "rays/s",
        "vs_baseline": round(headline / 5e6, 4),
        "modes": results,
        "cp_roofline": rooflines,
        "peak_bf16_tflops": peak,
        "note": ("'exact_oracle' is the reference-semantics fp32 "
                 "interpolant with no culling — a correctness oracle, "
                 "lookup-floored at ~2k rays/s on TPU (256 tile-priced "
                 "lookups/pt); 'exact_packed' is the fastest "
                 "exact-semantics TRAINABLE mode (packed word reads, "
                 "exact trilerp + exact scatter VJP); the other modes "
                 "are TPU operating points with "
                 "a converged occupancy grid (occupied fraction "
                 f"{occ_fracs[best]:.2f}); every non-exact operating "
                 "point is quality-validated on the hard textured scene "
                 "(quality_matrix.json, docs/PERF_NOTES.md)"),
        "quality_gate": ("headline mode quality gate: >=33 dB mean "
                         "4-pose textured holdout at the 240 s budget "
                         "(qm_r4_kprobe.json: 33.58 dB at p32/K=32)"),
    }
    line = json.dumps(payload)
    print(line)
    try:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"could not write {args.out}: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
