"""One-shot benchmark of every PERF_NOTES workload.

Produces the single source of truth for performance claims: every number in
``PERF_NOTES.md``, ``BASELINE.md`` and ``README.md`` comes from one run of
this script, written to ``bench_details.json`` (plus an optional
``customSmallerIsBetter`` array for CI via ``--output``).

Workloads (TPU backend; ``--backend cpu`` runs a reduced CPU-comparable
subset for CI runners):

- RL env step, 4096 instances x 10k particles x 13 elements (f32),
  with achieved-HBM-roofline fractions.
- ParameterBeam env step (same lattice, moments-only transport).
- 100k particles + screen readout, per method (histogram / cloud-in-cell at
  full 2448x2040 resolution, KDE at binning 8).
- Space-charge kick (drift-kick-drift segment, 32^3 grid) at 100k and 1M
  particles, Pallas kernels vs the XLA two-hot path, forward AND
  value_and_grad (the primitives' jvp/transpose rules keep the backward pass
  on-kernel).
- CIC deposit microbenchmark, 100k and 1M, Pallas vs XLA.
- Full 195-element ARES stage-3 lattice, 100k particles.

Timing: fori-loop slope method (``cheetah_tpu.utils.profiling.timeit_slope``)
— the only honest timer over the axon TPU tunnel; adaptive span for
sub-microsecond workloads.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Peak HBM bandwidth by device kind (GB/s). The roofline denominators must
# match the chip actually attached, not an assumed generation — getting this
# wrong misstates every *_hbm_pct by the bandwidth ratio.
HBM_GBPS_BY_KIND = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,  # v5p
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "TPU7x": 7400.0,
}
DEFAULT_TPU_GBPS = 819.0  # conservative fallback (v5e) for unknown kinds


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    parser.add_argument("--output", default=None, help="CI array-format JSON path")
    parser.add_argument("--only", default=None, help="substring filter on workload names")
    parser.add_argument(
        "--merge",
        action="store_true",
        help="with --only: merge the re-measured keys into the existing "
        "bench_details.json instead of discarding them",
    )
    args = parser.parse_args()

    if args.backend == "cpu":
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import cheetah_tpu as ct
    from cheetah_tpu.lattices import ares_ea_subcell, ares_stage3
    from cheetah_tpu.ops import pallas_cic
    # timeit_slope's default min_delta grows every TPU workload's loop span
    # until the slope clears the ~15 ms tunnel-fetch jitter by 10x. Without
    # it, 1-10 ms workloads at short spans return jitter, not device time
    # (bogus 0.21 ms / 0.0000 ms space-charge "gradients" in earlier runs).
    from cheetah_tpu.utils.profiling import timeit_slope

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    cpu_mode = not on_tpu
    f32 = jnp.float32
    details = {"backend": backend}
    hbm_gbps = None
    if on_tpu:
        device_kind = jax.devices()[0].device_kind
        details["device_kind"] = device_kind
        hbm_gbps = next(
            (
                gbps
                for kind, gbps in HBM_GBPS_BY_KIND.items()
                if device_kind.startswith(kind)
            ),
            DEFAULT_TPU_GBPS,
        )
        details["hbm_gbps_assumed"] = hbm_gbps

    def record(name, seconds, roofline_bytes=None):
        details[f"{name}_ms"] = seconds * 1e3
        if roofline_bytes is not None and hbm_gbps is not None:
            details[f"{name}_hbm_pct"] = round(
                roofline_bytes / seconds / 1e9 / hbm_gbps * 100, 1
            )
        print(f"{name}: {seconds * 1e3:.4f} ms", flush=True)

    def wants(name):
        return args.only is None or args.only in name

    def make_beam(num_particles):
        return ct.ParticleBeam.from_twiss(
            num_particles=num_particles,
            beta_x=jnp.asarray(5.0, f32),
            alpha_x=jnp.asarray(-1.0, f32),
            emittance_x=jnp.asarray(2e-9, f32),
            beta_y=jnp.asarray(3.0, f32),
            alpha_y=jnp.asarray(0.5, f32),
            emittance_y=jnp.asarray(2e-9, f32),
            energy=jnp.asarray(1.54e8, f32),
            total_charge=jnp.asarray(1e-10, f32),
            key=jax.random.PRNGKey(0),
            dtype=f32,
        )

    # ------------------------------------------------------------------
    # Env step (headline) + bf16 + ParameterBeam
    # ------------------------------------------------------------------
    num_instances = 4096 if on_tpu else 64
    num_particles = 10_000 if on_tpu else 1_000
    segment = ares_ea_subcell(dtype=f32)
    segment.AREAMQZM1.k1 = jnp.linspace(-20, 20, num_instances, dtype=f32)
    num_elements = len(segment.elements)
    beam_10k = make_beam(num_particles)
    env_step = jax.jit(lambda seg, beam: seg.track(beam).sigma_x)

    env_name = f"env_step_{num_instances}x{num_particles // 1000}k"
    if wants("env_step"):
        dt = timeit_slope(env_step, segment, beam_10k)
        record(env_name, dt, roofline_bytes=num_instances * num_particles * 7 * 4)
        details["transports_per_s"] = num_instances * num_particles * num_elements / dt

        # bf16 is no longer benchmarked: with the readout fused into the
        # transport epilogue the f32 step stopped being HBM-bound (bf16
        # measured 0.586 vs 0.579 ms), and on the non-HBM-bound dkd step
        # bf16 is 4.4x SLOWER (21.8 vs 4.9 ms — constant f32<->bf16
        # conversion around the transcendental/FMA chains). bf16 tracking
        # stays correctness-tested (tests/test_dtypes_and_structure.py,
        # space-charge f32-upcast path); PERF_NOTES records the decision.

    if wants("env_moments"):
        # Exact moments fast path (Segment.track_moments): same sigma_x
        # readout, no particle-array materialisation — sub-ms, so adaptive
        # span.
        dt = timeit_slope(
            jax.jit(lambda s, b: s.track_moments(b).sigma_x),
            segment,
            beam_10k,
            iters=200,
        )
        record(f"env_moments_{num_instances}x{num_particles // 1000}k", dt)

    if wants("env_second_order"):
        # Nonlinear variant: the tuned quad tracks second_order. Feasible at
        # 4096x10k only because _track_second_order keeps the peak
        # intermediate at (B, N, 7) — the naive two-step einsum's
        # (B, N, 7, 7) quadratic tensor would be 8 TB.
        seg2 = ares_ea_subcell(dtype=f32)
        seg2.AREAMQZM1.tracking_method = "second_order"
        seg2.AREAMQZM1.k1 = jnp.linspace(-20, 20, num_instances, dtype=f32)
        dt = timeit_slope(env_step, seg2, beam_10k)
        record(
            f"env_second_order_{num_instances}x{num_particles // 1000}k",
            dt,
            roofline_bytes=num_instances * num_particles * 7 * 4,
        )
        # Moments fast path through the same nonlinear lattice: the Gaussian
        # closure transports (mu, cov) through the fused bracket — no
        # particle array at all.
        dt = timeit_slope(
            jax.jit(lambda s, b: s.track_moments(b).sigma_x),
            seg2,
            beam_10k,
            iters=200,
        )
        record(
            f"env_second_order_moments_{num_instances}x{num_particles // 1000}k",
            dt,
        )

    if wants("env_dkd"):
        # Drift-kick-drift variant: the tuned quad uses the closed-form
        # Bmad-X map (one elementwise pass; num_steps has no effect on cost
        # or result for this element — the z correction telescopes exactly,
        # see Quadrupole._track_drift_kick_drift).
        seg3 = ares_ea_subcell(dtype=f32)
        seg3.AREAMQZM1.tracking_method = "drift_kick_drift"
        seg3.AREAMQZM1.num_steps = 5
        seg3.AREAMQZM1.k1 = jnp.linspace(-20, 20, num_instances, dtype=f32)
        dt = timeit_slope(env_step, seg3, beam_10k, iters=10)
        dkd_name = f"env_dkd_{num_instances}x{num_particles // 1000}k"
        # hbm_pct uses the SAME useful-traffic denominator as the linear env
        # step (one (B, N, 7) materialisation) — it answers "how far is this
        # path from the memory bound", not "how many bytes did HLO touch".
        record(dkd_name, dt, roofline_bytes=num_instances * num_particles * 7 * 4)
        if on_tpu:
            # VPU attribution (VERDICT round-3 item 1): count the step's
            # transcendentals from the compiled cost analysis and divide by a
            # peak transcendental rate MEASURED on this device (a pure-sin
            # reduce at the same array shape), so both numerator and
            # denominator are measurements, not datasheet guesses.
            def _transcendentals(jitted, *fn_args):
                analysis = jitted.lower(*fn_args).compile().cost_analysis()
                if isinstance(analysis, list):
                    analysis = analysis[0]
                return float(analysis.get("transcendentals", 0.0) or 0.0)

            try:
                n_trans = _transcendentals(env_step, seg3, beam_10k)
                # Compute-bound peak probe: chain sins over a VMEM-resident
                # array inside a fori_loop, so HBM traffic per transcendental
                # is ~zero (a single flat jnp.sin over a large array moves
                # ~8 B per eval and can be memory-bound, understating the
                # peak and inflating vpu_pct past 100%). The count is
                # chain * size by construction (cost_analysis counts a loop
                # body once, so it cannot be used here).
                sin_chain_length = 128
                probe = jnp.linspace(0.1, 1.0, 1 << 20, dtype=f32)  # 4 MB

                def sin_chain(x):
                    stirred = jax.lax.fori_loop(
                        0, sin_chain_length, lambda i, acc: jnp.sin(acc), x
                    )
                    return stirred.sum()

                dt_sin = timeit_slope(jax.jit(sin_chain), probe, iters=20)
                n_trans_sin = float(sin_chain_length * probe.size)
                if n_trans > 0 and n_trans_sin > 0:
                    peak_rate = n_trans_sin / dt_sin
                    details[f"{dkd_name}_transcendentals"] = n_trans
                    details["vpu_peak_transcendentals_per_s_measured"] = peak_rate
                    details[f"{dkd_name}_vpu_pct"] = round(
                        (n_trans / dt) / peak_rate * 100, 1
                    )
                    print(
                        f"{dkd_name}: {n_trans:.3g} transcendentals, "
                        f"vpu {details[f'{dkd_name}_vpu_pct']}% "
                        f"(peak {peak_rate:.3g}/s measured)",
                        flush=True,
                    )
            except Exception as exc:  # informational only — never abort a run
                details[f"{dkd_name}_vpu_pct_error"] = str(exc)[:200]

    if wants("env_dkd_dipole"):
        # Dipole drift_kick_drift on the same env workload: the tuned quad's
        # slot holds a sector bend with per-instance angles (exact Bmad-X
        # body, genuinely per-particle transcendentals through
        # phi1 = arcsin(px / px_norm) — no rank-1 factorisation applies; see
        # PERF_NOTES.md "dkd beyond the quadrupole").
        seg_d = ares_ea_subcell(dtype=f32)
        elements = list(seg_d.elements)
        elements[2] = ct.Dipole(
            jnp.asarray(0.122, f32),
            angle=jnp.linspace(-0.05, 0.05, num_instances, dtype=f32),
            tracking_method="drift_kick_drift",
            name="BENCHBEND",
        )
        seg_d = ct.Segment(elements, name="ARES_EA_dipole_dkd")
        dt = timeit_slope(env_step, seg_d, beam_10k, iters=10)
        record(
            f"env_dkd_dipole_{num_instances}x{num_particles // 1000}k",
            dt,
            roofline_bytes=num_instances * num_particles * 7 * 4,
        )

    if wants("env_dkd_tdc"):
        # TransverseDeflectingCavity (always drift_kick_drift) on the same
        # env workload, per-instance voltages.
        seg_t = ares_ea_subcell(dtype=f32)
        elements = list(seg_t.elements)
        elements[2] = ct.TransverseDeflectingCavity(
            jnp.asarray(0.122, f32),
            voltage=jnp.linspace(0.0, 2e7, num_instances, dtype=f32),
            phase=jnp.asarray(0.3, f32),
            frequency=jnp.asarray(2.998e9, f32),
            name="BENCHTDC",
        )
        seg_t = ct.Segment(elements, name="ARES_EA_tdc_dkd")
        dt = timeit_slope(env_step, seg_t, beam_10k, iters=10)
        record(
            f"env_dkd_tdc_{num_instances}x{num_particles // 1000}k",
            dt,
            roofline_bytes=num_instances * num_particles * 7 * 4,
        )

    if wants("parameter_beam"):
        parameter_beam = ct.ParameterBeam.from_twiss(
            beta_x=jnp.asarray(5.0, f32),
            emittance_x=jnp.asarray(2e-9, f32),
            beta_y=jnp.asarray(3.0, f32),
            emittance_y=jnp.asarray(2e-9, f32),
            energy=jnp.asarray(1.54e8, f32),
            dtype=f32,
        )
        # Tens-of-microseconds workload: adaptive span so the slope clears
        # tunnel jitter (fixed-span timing once produced a bogus 5e-9 ms).
        dt = timeit_slope(
            jax.jit(lambda s, b: s.track(b).sigma_x),
            segment,
            parameter_beam,
            iters=200,
        )
        record(f"parameter_beam_{num_instances}_env_step", dt)

    # ------------------------------------------------------------------
    # Screen readout methods, 100k particles
    # ------------------------------------------------------------------
    n_screen = 100_000 if on_tpu else 10_000
    beam_100k = make_beam(n_screen)
    screen_iters = 10 if on_tpu else 3
    screen_cases = [("histogram", 1), ("cloud-in-cell", 1), ("kde", 8)]
    if on_tpu:
        # KDE at the full 2448x2040 resolution (the reference's ~280x-cost
        # operating point, ref screen.py:25-29) — VERDICT round-3 item 9.
        # ~1e12 flop/eval; TPU-only (minutes on the CPU CI smoke).
        screen_cases.append(("kde", 1))
    for method, binning in screen_cases:
        name = f"track_{n_screen // 1000}k_screen_{method.replace('-', '_')}"
        if binning > 1:
            name += f"_binning{binning}"
        elif method == "kde":
            name += "_binning1"
        if not wants("screen") and not wants(name):
            continue
        seg = ares_ea_subcell(dtype=f32, screen=True)
        scr = seg.AREABSCR1
        scr.method = method
        scr.binning = binning

        @jax.jit
        def track_and_read(seg, beam):
            _, readings = seg.track_with_readings(beam)
            return readings["AREABSCR1"]

        record(name, timeit_slope(track_and_read, seg, beam_100k, iters=screen_iters))

    # ------------------------------------------------------------------
    # BASELINE config 2: grad of the screen centroid w.r.t. quad strength
    # ------------------------------------------------------------------
    if wants("grad_screen_centroid"):
        seg = ares_ea_subcell(dtype=f32, screen=True)
        seg.AREABSCR1.method = "cloud-in-cell"  # differentiable readout
        beam_grad = make_beam(num_particles)

        def centroid_loss(k1, seg, beam):
            seg.AREAMQZM1.k1 = k1
            _, readings = seg.track_with_readings(beam)
            image = readings["AREABSCR1"]
            centers_x, _ = seg.AREABSCR1.pixel_bin_centers
            column_mass = jnp.sum(image, axis=-2)
            return jnp.sum(column_mass * centers_x) / jnp.sum(column_mass)

        dt = timeit_slope(
            jax.jit(jax.value_and_grad(centroid_loss)),
            jnp.asarray(4.0, f32),
            seg,
            beam_grad,
            iters=20,
        )
        record(f"grad_screen_centroid_{num_particles // 1000}k", dt)

    # ------------------------------------------------------------------
    # BASELINE config 3: nonlinear chain (Cavity + Dipole + Sextupole)
    # ------------------------------------------------------------------
    if wants("nonlinear_chain"):
        chain = ct.Segment(
            [
                ct.Drift(jnp.asarray(0.2, f32)),
                ct.Cavity(
                    jnp.asarray(1.0, f32),
                    voltage=jnp.asarray(2e7, f32),
                    phase=jnp.asarray(30.0, f32),
                    frequency=jnp.asarray(1.3e9, f32),
                    name="cav",
                ),
                ct.Drift(jnp.asarray(0.2, f32)),
                ct.Dipole(
                    jnp.asarray(0.4, f32),
                    angle=jnp.asarray(0.15, f32),
                    tracking_method="drift_kick_drift",
                    name="dip",
                ),
                ct.Drift(jnp.asarray(0.2, f32)),
                ct.Sextupole(
                    jnp.asarray(0.2, f32), k2=jnp.asarray(60.0, f32), name="sext"
                ),
                ct.Drift(jnp.asarray(0.2, f32)),
            ]
        )
        dt = timeit_slope(
            jax.jit(lambda s, b: s.track(b).particles),
            chain,
            beam_100k,
            iters=50 if on_tpu else 5,
        )
        record(f"nonlinear_chain_{n_screen // 1000}k", dt)

    # ------------------------------------------------------------------
    # Space charge: forward and gradient, Pallas vs XLA
    # ------------------------------------------------------------------
    def sc_segment():
        return ct.Segment(
            [
                ct.Drift(jnp.asarray(0.1, f32)),
                ct.SpaceChargeKick(jnp.asarray(0.2, f32)),
                ct.Drift(jnp.asarray(0.1, f32)),
                ct.SpaceChargeKick(jnp.asarray(0.2, f32)),
                ct.Drift(jnp.asarray(0.1, f32)),
            ]
        )

    # Differentiate w.r.t. the FIRST drift length: it moves the particles
    # that feed the deposit, so the whole deposit->FFT->gather pipeline is in
    # the differentiated path and cannot be hoisted out of the timing loop
    # (differentiating only effect_length lets XLA hoist everything but the
    # final momentum scale, which once produced a bogus 0.2 ms "gradient").
    def sc_loss(drift_length, s, b):
        s.elements[0].length = drift_length
        return jnp.sum(jnp.square(s.track(b).px))

    el = jnp.asarray(0.1, f32)

    sc_sizes = [(100_000, "100k", 10), (1_000_000, "1M", 5)]
    if cpu_mode:
        sc_sizes = [(20_000, "20k", 3)]
    # On CPU the Pallas kernels never dispatch, so there is one (XLA) variant.
    variants = [("", True)] if cpu_mode else [("_pallas", True), ("_xla", False)]
    for n, label, iters in sc_sizes:
        beam_n = beam_100k if n == n_screen else make_beam(n)
        for suffix, enabled in variants:
            if not wants("space_charge"):
                continue
            pallas_cic.ENABLED = enabled
            # Build the jitted callables INSIDE the variant loop: the
            # ENABLED flag is read at trace time, and a jitted function
            # traced under the other variant would be silently reused from
            # the trace cache for identical avals/treedefs (fresh
            # auto-generated element names currently force a re-trace, but
            # that is an accident, not a contract).
            sc_fwd = jax.jit(lambda s, b: s.track(b).particles)
            sc_grad = jax.jit(jax.value_and_grad(sc_loss))
            record(
                f"space_charge_{label}{suffix}",
                timeit_slope(sc_fwd, sc_segment(), beam_n, iters=iters),
            )
            record(
                f"space_charge_grad_{label}{suffix}",
                timeit_slope(sc_grad, el, sc_segment(), beam_n, iters=iters),
            )
    pallas_cic.ENABLED = True

    # Fine 64^3 grid (beyond the XLA two-hot's cell cap, inside the raised
    # Pallas VMEM bound): one kick, 1M particles — the scatter fallback this
    # replaced measured 219.7 ms.
    if wants("space_charge_kick_1M_64c") and on_tpu:
        kick_64 = ct.SpaceChargeKick(
            jnp.asarray(0.5, f32), grid_shape=(64, 64, 64)
        )
        record(
            "space_charge_kick_1M_64c_pallas",
            timeit_slope(
                jax.jit(lambda k, b: k.track(b).particles),
                kick_64,
                make_beam(1_000_000),
                iters=5,
            ),
        )

    # High-fidelity 128^3 grid (FEL-injector class): past the untiled
    # kernel's whole-grid-in-VMEM bound, runs on the sort-based x-tiled
    # Pallas kernels (pallas_cic_tiled.py) — the scatter fallback this
    # replaces is 22-36x slower per deposit/gather.
    if wants("space_charge_kick_1M_128c") and on_tpu:
        kick_128 = ct.SpaceChargeKick(
            jnp.asarray(0.5, f32), grid_shape=(128, 128, 128)
        )
        record(
            "space_charge_kick_1M_128c_pallas",
            timeit_slope(
                jax.jit(lambda k, b: k.track(b).particles),
                kick_128,
                make_beam(1_000_000),
                iters=3,
            ),
        )

    # ------------------------------------------------------------------
    # CIC deposit microbenchmark, Pallas vs XLA
    # ------------------------------------------------------------------
    if wants("deposit") and on_tpu:
        from cheetah_tpu.ops.cloud_in_cell import (
            _deposit_tensor_product,
            cloud_in_cell_charge_deposition,
        )

        for n, label in [(100_000, "100k"), (1_000_000, "1M")]:
            pos = jax.random.normal(jax.random.key(7), (1, n, 3), f32) * 2.0
            charges = jax.random.uniform(jax.random.key(8), (1, n), f32)
            extent = jnp.broadcast_to(jnp.asarray([[-3.0, 3.0]] * 3, f32), (1, 3, 2))
            record(
                f"cic_deposit_{label}_32c_pallas",
                timeit_slope(
                    jax.jit(
                        lambda p, c, e: cloud_in_cell_charge_deposition(
                            p, (32, 32, 32), e, c
                        )
                    ),
                    pos,
                    charges,
                    extent,
                    iters=50,
                ),
            )
            record(
                f"cic_deposit_{label}_32c_xla",
                timeit_slope(
                    jax.jit(
                        lambda p, c, e: _deposit_tensor_product(
                            p, c, [32, 32, 32], e
                        )
                    ),
                    pos,
                    charges,
                    extent,
                    iters=50,
                ),
            )

    # ------------------------------------------------------------------
    # Full ARES stage-3 lattice
    # ------------------------------------------------------------------
    if wants("ares_full"):
        ares = ares_stage3(dtype=f32)
        record(
            f"ares_full_lattice_{n_screen // 1000}k",
            timeit_slope(
                jax.jit(lambda s, b: s.track(b).particles),
                ares,
                beam_100k,
                iters=200 if on_tpu else 10,
            ),
        )

    # ------------------------------------------------------------------
    # DCN collective-volume audit (subprocess: needs an 8-device CPU mesh)
    # ------------------------------------------------------------------
    if args.only is None:
        import subprocess

        # Never let the audit subprocess abort the run: a hang or crash here
        # would discard the whole set of completed TPU measurements (they
        # are only written below).
        audit = None
        try:
            audit = subprocess.run(
                [
                    sys.executable,
                    str(pathlib.Path(__file__).parent / "dcn_audit.py"),
                ],
                capture_output=True,
                text=True,
                timeout=600,
            )
            audit_lines = audit.stdout.strip().splitlines()
            if audit.returncode != 0 or not audit_lines:
                raise json.JSONDecodeError("audit produced no JSON", "", 0)
            audit_line = audit_lines[-1]
            details.update(json.loads(audit_line))
            print(f"dcn audit: {audit_line}", flush=True)
        except subprocess.TimeoutExpired:
            print("dcn audit failed: timed out after 600 s", flush=True)
        except (json.JSONDecodeError, OSError):
            stderr = audit.stderr[-500:] if audit is not None and audit.stderr else "<no stderr>"
            print(f"dcn audit failed: {stderr}", flush=True)

    # The committed artifact records the TPU numbers; a CPU run (CI) only
    # writes the --output array so it cannot clobber the TPU source of truth.
    out_path = pathlib.Path(__file__).resolve().parent.parent / "bench_details.json"
    if args.only is None and on_tpu:
        out_path.write_text(json.dumps(details, indent=2) + "\n")
        print(f"wrote {out_path}")
    elif args.only is not None and args.merge and on_tpu and out_path.exists():
        merged = json.loads(out_path.read_text())
        new_keys = sorted(k for k in details if k != "backend")
        merged.update({k: details[k] for k in new_keys})
        # Mark mixed-run artifacts: derived cross-key ratios may compare
        # measurements from different sessions (the full-run invariant
        # "every number comes from one run" no longer holds).
        merged["merged"] = True
        merged.setdefault("merged_keys", [])
        merged["merged_keys"] = sorted(set(merged["merged_keys"]) | set(new_keys))
        out_path.write_text(json.dumps(merged, indent=2) + "\n")
        print(f"merged {len(new_keys)} keys into {out_path}: {new_keys}")
    elif args.merge:
        print(
            "warning: --merge skipped "
            f"({'not on TPU' if not on_tpu else 'no existing ' + str(out_path)})",
            flush=True,
        )

    if args.output:
        array = [
            {"name": k[: -len("_ms")], "unit": "ms", "value": v}
            for k, v in details.items()
            if k.endswith("_ms")
        ]
        pathlib.Path(args.output).write_text(json.dumps(array, indent=2) + "\n")
        print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
