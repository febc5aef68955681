"""Benchmark orchestrator: end-to-end fused pipeline throughput + SW
kernel on the real chip, with a live (time-boxed) CPU baseline.

Headline metric: gaps/s of the FUSED pipeline slice — the production
collect->assemble->pick dataplane (classify, gap-home routing, dedup,
k-mer counting, DBG unitig assembly, flank pick scoring) in one jit
(gappadder_tpu/parallel/slice.py). The reference's counterpart is the
per-gap process soup of /root/reference/assemble_gaps.py:296-318.
vs_baseline = TPU / CPU-backend ratio of the SAME computation.

UN-TIMEOUT-ABLE BY CONSTRUCTION (round-2 postmortem: rc=124 wiped the
round's perf evidence). This process does NO jax work itself; each
measurement runs in a subprocess under its own timeout inside a global
wall-clock budget (GAPPADDER_BENCH_BUDGET, default 420 s). Device init
plus the first tunnel transfer costs ~100 s on the axon-tunneled TPU,
so ALL device-side measurements share one subprocess
(scripts/tpu_bench_json.py) which writes results INCREMENTALLY to a
file — killing it on timeout still yields whatever finished. The CPU
baseline runs second (cheap: CPU backend, fast compiles) and falls
back to a recorded builder-local figure (marked
"cpu_baseline_source": "cached") if it doesn't fit the budget. The
JSON line is printed from whatever landed — worst case it still
appears with degraded fields.

Timing methodology (docs/kernel-notes.md): on the axon-tunneled TPU,
jax.block_until_ready can return before the device finishes, so every
device number is slope-timed — K dependency-chained steps inside ONE
jit, forced host readback, best-of-N, (t(K_hi)-t(K_lo))/(K_hi-K_lo).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import json
import os
import subprocess
import sys
import tempfile
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
_T0 = time.monotonic()
BUDGET = float(os.environ.get("GAPPADDER_BENCH_BUDGET", "420"))

# Builder-local CPU baseline of the same fused-slice computation
# (scripts/slice_bench.py --cpu), recorded so a slow CPU box can never
# sink the bench. Superseded by the live run whenever it fits.
CACHED_CPU = {"gaps_per_s_1shard": 116.7, "gaps_per_s_8shard": 152.7,
              "source": "builder-local round 3 (2-core CPU)"}

# CPU-backend run of the PRODUCTION-shape slice (six (k,sub_k)
# 30/40/50, 300bp flanks, 16 gaps/step; scripts/slice_bench.py
# --production --cpu). Too slow to fit the bench budget live
# (~5 min of CPU compiles), so the builder-local figure backs the
# production vs_baseline row; re-measure with the same command.
CACHED_CPU_PRODUCTION = {"gaps_per_s": 21.2,
                         "source": "builder-local round 5 (2-core CPU, "
                                   "live run 2026-08-21)"}


def remaining() -> float:
    return BUDGET - (time.monotonic() - _T0)


def run_stage(argv, timeout):
    """Run a bench stage subprocess; return its last stdout JSON line
    or None. Never raises."""
    if timeout < 5:
        return None
    try:
        out = subprocess.run(
            [sys.executable] + argv, capture_output=True, text=True,
            timeout=timeout, cwd=_ROOT)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-1500:] + "\n")
            return None
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith(("{", "[")):
                return json.loads(line)
        return None
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"bench stage timed out: {argv}\n")
        return None
    except Exception as e:  # noqa: BLE001 — bench must never crash
        sys.stderr.write(f"bench stage failed: {argv}: {e}\n")
        return None


def main():
    extras = {"bench_budget_s": BUDGET}

    # 1) live CPU baseline FIRST (cheap, fast compiles): vs_baseline
    #    must come from a live run, so it gets budget priority; the
    #    weak-scaling row is bounded to the PHYSICAL core count
    #    (shards beyond cores only measure oversubscription)
    ncores = os.cpu_count() or 1
    n_scale = min(8, 1 << max(ncores - 1, 0).bit_length())
    cpu_rows = run_stage(
        [os.path.join("scripts", "slice_bench.py"), "--cpu",
         f"--shards=1,{n_scale}", "--gaps=64"],
        timeout=max(30, min(remaining() - 150, 180)))

    # 2) device-side stage: SW kernel + fused slice (+ production
    #    row), one subprocess, incremental result file survives a
    #    timeout kill. 64 gaps/step = the shipped default gap_batch.
    fd, out_path = tempfile.mkstemp(suffix=".json", prefix="gpt_bench_")
    os.close(fd)
    dev = run_stage(
        [os.path.join("scripts", "tpu_bench_json.py"),
         f"--out={out_path}", "--gaps=64"],
        timeout=remaining() - 15)
    if dev is None:  # killed or crashed: salvage the incremental file
        try:
            with open(out_path) as f:
                dev = json.load(f)
            extras["device_stage"] = "partial (timed out)"
        except Exception:
            dev = {}
    try:
        os.unlink(out_path)
    except OSError:
        pass

    slice_row = dev.get("slice")
    for k in ("backend", "device_init_s", "sw_error", "slice_error"):
        if k in dev:
            extras[k] = dev[k]
    for k in ("sw_reads_aligned_per_s", "sw_gcups", "sw_impl",
              "sw_vs_numpy_host"):
        if k in dev:
            extras[k] = dev[k]
    if slice_row:
        extras["e2e_records_per_s"] = slice_row["records_per_s"]
        extras["e2e_route_impl"] = slice_row["route_impl"]
    prod_row = dev.get("slice_production")
    if prod_row:
        extras["e2e_production_gaps_per_s"] = round(
            prod_row["gaps_per_s"], 1)
        extras["e2e_production_vs_baseline"] = round(
            prod_row["gaps_per_s"]
            / CACHED_CPU_PRODUCTION["gaps_per_s"], 2)
        extras["e2e_production_cpu_baseline"] = CACHED_CPU_PRODUCTION
        extras["e2e_production_unit"] = (
            "gaps/s, fused slice at REFERENCE shape: six (k,sub_k) "
            "30/40/50, 300bp flanks, 100bp reads, skewed 100-1000bp "
            "gaps (the headline row above is the toy shape: one "
            "(17,15) setting, 96bp flanks)")
    elif "slice_production_error" in dev:
        extras["slice_production_error"] = dev["slice_production_error"]

    if cpu_rows:
        cpu1 = cpu_rows[0]["gaps_per_s"]
        extras["cpu_baseline_source"] = "live"
        extras["cpu_gaps_per_s"] = round(cpu1, 2)
        extras["cpu_scaling"] = {
            "gaps_per_s": [round(r["gaps_per_s"], 2) for r in cpu_rows],
            "shards": [r["n_shards"] for r in cpu_rows],
            "physical_cores": ncores,
            "note": ("shards beyond physical_cores oversubscribe this "
                     "box; not scaling evidence" if
                     max(r["n_shards"] for r in cpu_rows) > ncores
                     else "shards <= physical cores"),
        }
    else:
        cpu1 = CACHED_CPU["gaps_per_s_1shard"]
        extras["cpu_baseline_source"] = "cached"
        extras["cpu_gaps_per_s"] = cpu1
        extras["cpu_baseline_note"] = CACHED_CPU["source"]

    extras["bench_elapsed_s"] = round(time.monotonic() - _T0, 1)

    if slice_row:
        rec = {
            "metric": "e2e_gaps_per_s",
            "value": round(slice_row["gaps_per_s"], 1),
            "unit": (f"gaps/s, fused collect+assemble+pick slice "
                     f"({slice_row['n_gaps_per_step']} gaps x "
                     f"{slice_row['n_records_per_step']} records/step, "
                     f"slope-timed, vs CPU-backend run of the same "
                     f"computation)"),
            "vs_baseline": round(slice_row["gaps_per_s"] / cpu1, 2),
            **extras,
        }
    elif "sw_reads_aligned_per_s" in extras:  # slice didn't land
        rec = {
            "metric": "sw_reads_aligned_per_s",
            "value": extras["sw_reads_aligned_per_s"],
            "unit": (f"128x1024 local DP/s ({extras.get('sw_impl')}, "
                     f"{extras.get('sw_gcups')} GCUPS, slope-timed)"),
            "vs_baseline": extras.get("sw_vs_numpy_host", 0.0),
            **extras,
        }
    else:  # worst case: still emit a parseable line
        rec = {"metric": "bench_degraded", "value": 0.0,
               "unit": "no device stage finished within budget",
               "vs_baseline": 0.0, **extras}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
