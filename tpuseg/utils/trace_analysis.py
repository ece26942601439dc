"""Per-op device-time analysis of jax.profiler traces.

The roofline and remat findings in BASELINE.md (rounds 2-3) come from
joining a ``jax.profiler`` device trace with the compiled-HLO op metadata;
this module makes that analysis a reusable subsystem (SURVEY.md §5.1 —
the reference has nothing beyond wall-clock prints, train.py:135) instead
of an ad-hoc script:

    python -m tpuseg.utils.trace_analysis <profile_dir> [--top N]

``<profile_dir>`` is what ``--profile_steps`` wrote (the directory holding
``plugins/profile/<ts>/*.xplane.pb``). Output: total device time and
achieved FLOP/s (XLA's per-op flop counts), the share of rematerialized
ops, fwd/bwd convolution / BatchNorm / pool / RNG / collective breakdowns
(classified from the per-op ``tf_op`` jax path metadata), and the top-N
ops.

Parsing uses the TF-bundled XPlane protobuf (imported lazily — TF is a
test-only dependency elsewhere in the repo too). TPU device traces carry
an "XLA Ops" line on the ``/device:TPU:N`` plane; host-only (CPU) traces
have no device plane and are reported as such rather than guessed at.
"""

from __future__ import annotations

import glob
import os
from collections import Counter
from typing import Dict, List, Optional, Tuple

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute")


def _hlo_opcode(rhs: str) -> str:
    """The opcode token of an HLO definition's right-hand side — the word
    immediately before the operand parenthesis, after skipping the result
    shape: ``(s32[], f32[8]) while(%cond, ...)`` -> ``while``;
    ``f32[8]{0} fusion(...)`` -> ``fusion``.  The shape is skipped
    structurally, not by splitting on ``(``: a TPU layout annotation embeds
    parentheses in a whitespace-free token (``f32[8]{0:T(8,128)}``), so the
    opcode is the first token AFTER the shape token (review r5)."""
    rhs = rhs.strip()
    if rhs.startswith("("):  # tuple shape: skip to its matching close paren
        depth = 0
        for i, ch in enumerate(rhs):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    rhs = rhs[i + 1:].lstrip()
                    break
        return rhs.split("(", 1)[0].strip()
    # array/scalar shape: one whitespace-free token (layouts included),
    # then the opcode, possibly abutting its operand parenthesis
    parts = rhs.split(None, 1)
    if len(parts) < 2:
        return ""
    return parts[1].split("(", 1)[0].strip()


def is_control_flow_span(name: str) -> bool:
    """True for while/conditional trace events.  These span their whole body
    on the device timeline, and the body's ops are traced as their OWN
    events on the same line — summing both double-counts every loop body
    (observed on the tiled-inference program, whose lax.map chunk loop is a
    single ``%while`` covering ~half the raw event time).  ``name`` is the
    HLO definition text; the opcode is parsed as the token before the
    operand parenthesis (not a substring match — an op renamed
    ``%while_init`` or operand text containing ``" while("`` must NOT be
    excluded from totals, ADVICE r4), with the default-name prefix check
    anchored to ``%while.``/``%conditional.`` for bare-name events that
    carry no definition text."""
    inst, sep, rhs = name.partition(" = ")
    inst = inst.strip()
    anchored = (inst in ("%while", "%conditional")
                or inst.startswith(("%while.", "%conditional.")))
    if not sep:
        return anchored
    return anchored or _hlo_opcode(rhs) in ("while", "conditional")


def classify_op(name: str, tf_op: str = "") -> str:
    """Category for one XLA op: ``name`` is the HLO definition text,
    ``tf_op`` the jax op path from trace metadata (e.g.
    ``jit(..)/transpose(jvp(UNet))/enc1a/bn/reduce_sum``). Remat duplicates
    are counted as their own category — their time is spent twice."""
    if ".remat" in name:
        return "remat"
    if any(c in name for c in _COLLECTIVES):
        return "collective"
    direction = "bwd" if "transpose(jvp" in tf_op else "fwd"
    if "/bn/" in tf_op:
        return f"batchnorm_{direction}"
    if "conv_general_dilated" in tf_op or "conv_transpose" in tf_op:
        return f"conv_{direction}"
    if "select_and_scatter" in tf_op or "reduce_window" in tf_op or "max_pool" in tf_op:
        return f"pool_{direction}"
    if any(k in tf_op for k in ("bernoulli", "threefry", "random_bits", "_uniform")):
        return "rng"
    return "other"


def find_xplane(profile_dir: str) -> Optional[str]:
    """Newest .xplane.pb under a --profile_steps output directory."""
    hits = glob.glob(os.path.join(profile_dir, "**", "*.xplane.pb"), recursive=True)
    return max(hits, key=os.path.getmtime) if hits else None


def analyze(profile_dir: str, top: int = 25) -> Dict:
    """Aggregate device-op time.

    Returns ``{"device_plane": str|None, "total_ms": float, "steps": int,
    "tflops_per_sec": float, "logical_gb_per_sec": float,
    "categories": {cat: ms}, "top_ops": [(ms, share, name), ...]}``.
    ``device_plane`` is None (and the rest empty/zero) for host-only traces.
    """
    fp = find_xplane(profile_dir)
    if fp is None:
        raise IOError(f"no .xplane.pb under {profile_dir} — did --profile_steps run?")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy: heavy import

    xs = xplane_pb2.XSpace()
    with open(fp, "rb") as f:
        xs.ParseFromString(f.read())

    planes = [p for p in xs.planes
              if p.name.startswith("/device:") and any(
                  l.name == "XLA Ops" and l.events for l in p.lines)]
    if not planes:
        return {"device_plane": None, "planes": 0, "total_ms": 0.0, "steps": 0,
                "tflops_per_sec": 0.0, "logical_gb_per_sec": 0.0,
                "categories": {}, "top_ops": [],
                "note": "no device XLA-op plane (host-only trace?)"}

    # Aggregate over ALL device planes (multi-chip traces have one per local
    # device; summing only the first would report ~1/n of the device work).
    # Keyed by op name so the same fusion running on every chip is one row.
    steps = 0
    agg: Counter = Counter()            # op name -> summed duration_ps
    cf: Counter = Counter()             # control-flow spans, kept out of agg
    op_meta: Dict[str, str] = {}        # op name -> tf_op path
    flops_total = 0.0
    bytes_total = 0.0
    for plane in planes:
        sm = plane.stat_metadata
        em = plane.event_metadata

        def md_stats(md) -> Tuple[str, float, float]:
            tf_op, flops, bbytes = "", 0.0, 0.0
            for st in md.stats:
                sname = sm[st.metadata_id].name
                if sname == "tf_op":
                    tf_op = st.str_value
                elif sname == "flops":
                    flops = float(st.int64_value or st.uint64_value)
                elif sname == "bytes_accessed":
                    bbytes = float(st.int64_value or st.uint64_value)
            return tf_op, flops, bbytes

        meta_cache: Dict[int, Tuple[str, str, float, float]] = {}
        for line in plane.lines:
            if line.name == "Steps":
                steps = max(steps, len(line.events))
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                mid = ev.metadata_id
                if mid not in meta_cache:
                    md = em[mid]
                    tf_op, flops, bbytes = md_stats(md)
                    meta_cache[mid] = (md.name, tf_op, flops, bbytes)
                name, tf_op, flops, bbytes = meta_cache[mid]
                if is_control_flow_span(name):
                    cf[name] += ev.duration_ps
                    continue
                agg[name] += ev.duration_ps
                op_meta.setdefault(name, tf_op)
                flops_total += flops
                bytes_total += bbytes

    total_ps = sum(agg.values())
    cats: Counter = Counter()
    for name, ps in agg.items():
        cats[classify_op(name, op_meta[name])] += ps
    top_ops = [(ps / 1e9, ps / total_ps if total_ps else 0.0, name)
               for name, ps in agg.most_common(top)]
    return {
        "device_plane": planes[0].name,
        "planes": len(planes),
        "total_ms": total_ps / 1e9,
        "steps": steps,
        # flops are per-execution; duration sums over executions (and over
        # device planes) too, so the ratio is the achieved rate over the
        # traced window — per device-second, i.e. the per-chip MFU number
        "tflops_per_sec": (flops_total / (total_ps / 1e12) / 1e12) if total_ps else 0.0,
        # XLA cost-analysis bytes are UNPADDED logical bytes; real HBM
        # traffic is higher wherever layouts pad (C=64 pads 2x in bf16)
        "logical_gb_per_sec": (bytes_total / (total_ps / 1e12) / 1e9) if total_ps else 0.0,
        "categories": {k: v / 1e9 for k, v in cats.most_common()},
        "top_ops": top_ops,
        # while/conditional events span their whole body, whose ops are
        # already counted above — reported separately, never summed in
        "control_flow_ms": sum(cf.values()) / 1e9,
    }


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        prog="trace_analysis",
        description="Aggregate per-op device time from a jax.profiler trace "
                    "(the --profile_steps output)")
    parser.add_argument("profile_dir", type=str,
                        help="directory holding plugins/profile/<ts>/*.xplane.pb")
    parser.add_argument("--top", type=int, default=25,
                        help="how many ops to list")
    args = parser.parse_args(argv)

    r = analyze(args.profile_dir, args.top)
    if r["device_plane"] is None:
        print(r["note"])
        return
    per_step = f" ({r['total_ms'] / r['steps']:.1f} ms/step over {r['steps']} steps)" \
        if r["steps"] else ""
    n_planes = r.get("planes", 1)
    extra = f" (+{n_planes - 1} more device planes, summed)" if n_planes > 1 else ""
    print(f"device plane: {r['device_plane']}{extra}")
    print(f"total device time: {r['total_ms']:.1f} ms{per_step}")
    if r.get("control_flow_ms"):
        print(f"(while/conditional spans excluded — their bodies are the ops "
              f"below: {r['control_flow_ms']:.1f} ms)")
    # the hardcoded peaks are v5e roofline anchors — only meaningful when
    # the trace actually came from a TPU plane
    is_tpu = "TPU" in r["device_plane"].upper()
    compute_peak = " (XLA per-op flop counts; v5e bf16 peak 197)" if is_tpu \
        else " (XLA per-op flop counts)"
    bw_peak = (" (unpadded cost-analysis bytes; padded HBM traffic is "
               "higher, v5e peak ~819)") if is_tpu \
        else " (unpadded cost-analysis bytes)"
    print(f"achieved compute: {r['tflops_per_sec']:.1f} TFLOP/s{compute_peak}")
    print(f"logical bandwidth: {r['logical_gb_per_sec']:.0f} GB/s{bw_peak}")
    print("\nby category ('remat' time is work spent twice — HBM-pressure "
          "recompute):")
    total_ms = r["total_ms"] or 1e-12  # all-zero-duration events: show 0%
    for cat, ms in r["categories"].items():
        print(f"  {cat:<14} {ms:9.2f} ms  {ms / total_ms * 100:5.1f}%")
    print(f"\ntop {len(r['top_ops'])} ops:")
    for ms, share, name in r["top_ops"]:
        print(f"  {ms:8.2f} ms  {share * 100:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
