"""Trace-analysis subsystem (utils/trace_analysis): classification + parsing."""

import numpy as np
import pytest

from tpuseg.utils.trace_analysis import analyze, classify_op, find_xplane


def test_classify_op_categories():
    assert classify_op("%f = fusion(...)",
                       "jit(x)/jvp(UNet)/enc1a/conv/conv_general_dilated") == "conv_fwd"
    assert classify_op("%f = fusion(...)",
                       "jit(x)/transpose(jvp(UNet))/enc1a/conv/conv_general_dilated") == "conv_bwd"
    assert classify_op("%f = fusion(...)",
                       "jit(x)/jvp(UNet)/enc1a/bn/reduce_sum") == "batchnorm_fwd"
    assert classify_op("%f = fusion(...)",
                       "jit(x)/transpose(jvp(UNet))/enc1a/bn/mul") == "batchnorm_bwd"
    # convert_element_type must NOT classify as convolution (substring trap)
    assert classify_op("%convert_reduce_fusion = ...",
                       "jit(x)/jvp(UNet)/convert_element_type") == "other"
    assert classify_op("%fusion.22.remat = ...", "") == "remat"
    assert classify_op("%ar = f32[2] all-reduce(...)", "") == "collective"
    assert classify_op("%s = fusion(...)",
                       "jit(x)/transpose(jvp(UNet))/select_and_scatter") == "pool_bwd"
    assert classify_op("%r = fusion(...)", "jit(x)/drop5/jit(_bernoulli)/x") == "rng"
    assert classify_op("%m = custom-call(...)", "") == "other"
    # precedence: a rematerialized conv counts as remat (double-spent time)
    assert classify_op("%conv.remat = ...",
                       "jit(x)/jvp(UNet)/enc1a/conv/conv_general_dilated") == "remat"


def test_analyze_host_only_trace(tmp_path):
    """A CPU-only trace (no device XLA-op plane) is reported as such, not
    mis-parsed; missing traces raise IOError."""
    import jax
    import jax.numpy as jnp

    from tpuseg.utils.profiling import trace

    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.ones((64, 64))
    float(f(x))
    d = str(tmp_path / "prof")
    with trace(d):
        float(f(x))
    assert find_xplane(d) is not None
    r = analyze(d)
    # on the CPU test mesh there is no /device: plane with XLA Ops
    if r["device_plane"] is None:
        assert "note" in r
    else:  # pragma: no cover - if jax ever emits one, the numbers must add up
        assert r["total_ms"] >= 0

    with pytest.raises(IOError, match="no .xplane.pb"):
        analyze(str(tmp_path / "empty"))


def test_cli_runs(tmp_path, capsys):
    import jax
    import jax.numpy as jnp

    from tpuseg.utils.profiling import trace
    from tpuseg.utils.trace_analysis import main

    f = jax.jit(lambda x: (x * x).sum())
    x = jnp.ones((32, 32))
    float(f(x))
    d = str(tmp_path / "prof")
    with trace(d):
        float(f(x))
    main([d])
    out = capsys.readouterr().out
    assert "host-only" in out or "total device time" in out


def _plane(xs, name, op_ms):
    """Add a /device: plane with an XLA Ops line; op_ms = {op_name: ms}."""
    p = xs.planes.add()
    p.name = name
    p.stat_metadata[1].id = 1
    p.stat_metadata[1].name = "tf_op"
    line = p.lines.add()
    line.name = "XLA Ops"
    for i, (op, ms) in enumerate(op_ms.items(), start=1):
        md = p.event_metadata[i]
        md.id = i
        md.name = op
        ev = line.events.add()
        ev.metadata_id = i
        ev.duration_ps = int(ms * 1e9)


def test_analyze_sums_all_device_planes(tmp_path):
    """Multi-chip traces carry one plane per local device; totals must sum
    across ALL of them, and the same fusion on every chip is one row
    (review r3 — a single-plane walk reported 1/n of the device work)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    _plane(xs, "/device:TPU:0", {"%fusion.1": 10.0, "%all-reduce.2": 2.0})
    _plane(xs, "/device:TPU:1", {"%fusion.1": 30.0, "%all-reduce.2": 6.0})
    d = tmp_path / "prof"
    d.mkdir()
    (d / "host.xplane.pb").write_bytes(xs.SerializeToString())

    r = analyze(str(d))
    assert r["planes"] == 2
    assert r["total_ms"] == pytest.approx(48.0)
    # per-op rows merge across planes by op name
    top = {name: ms for ms, _, name in r["top_ops"]}
    assert top["%fusion.1"] == pytest.approx(40.0)
    assert top["%all-reduce.2"] == pytest.approx(8.0)
    assert r["categories"]["collective"] == pytest.approx(8.0)


def test_analyze_excludes_control_flow_spans(tmp_path):
    """A while/conditional event spans its whole body on the device
    timeline while the body's ops are traced as their own events — summing
    both double-counted every loop body (observed: the tiled-inference
    chunk loop reported ~2x real device time). Spans are reported
    separately, never summed into totals."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    from tpuseg.utils.trace_analysis import is_control_flow_span

    xs = xplane_pb2.XSpace()
    _plane(xs, "/device:TPU:0", {
        "%while.2 = (s32[]{:T(128)}) while(...)": 50.0,  # spans the two below
        "%fusion.1": 30.0,
        "%fusion.9 = f32[8] fusion(...), conditional=...": 20.0,
    })
    d = tmp_path / "prof"
    d.mkdir()
    (d / "host.xplane.pb").write_bytes(xs.SerializeToString())

    r = analyze(str(d))
    assert r["total_ms"] == pytest.approx(50.0)
    assert r["control_flow_ms"] == pytest.approx(50.0)
    assert all("while" not in name for _, _, name in r["top_ops"])
    # a fusion whose text merely mentions control flow is NOT a span
    assert not is_control_flow_span("%fusion.9 = f32[8] fusion(...)")
    assert is_control_flow_span("%body = (f32[2]) conditional(%p, %t, %f)")


def test_control_flow_span_opcode_parsing():
    """The span check parses the opcode token, not substrings (ADVICE r4):
    an op RENAMED %while_init, or a fusion whose operand text contains
    ' while(' / ' conditional(', must not be excluded from totals; renamed
    control flow with definition text is still caught via its opcode."""
    from tpuseg.utils.trace_analysis import is_control_flow_span

    # true control flow, default and renamed instruction names
    assert is_control_flow_span("%while.2 = (s32[]) while(%init)")
    assert is_control_flow_span("%while")  # bare default name, no def text
    assert is_control_flow_span("%while.7")
    assert is_control_flow_span("%loop = (s32[], f32[8]) while(%init)")
    assert is_control_flow_span("%cond_apply = f32[2] conditional(%p, %t)")

    # NOT control flow: names/operands that merely embed the words
    assert not is_control_flow_span("%while_init")  # renamed fusion, no def
    assert not is_control_flow_span(
        "%while_init = f32[8] fusion(%a), calls=%b")
    assert not is_control_flow_span(
        "%fusion.3 = f32[8] fusion(%param_while(...))")
    assert not is_control_flow_span(
        "%conditional_input = s32[] copy(%x)")
    # tuple-shape parse does not mistake the shape for the opcode
    assert not is_control_flow_span(
        "%fusion.4 = (f32[2], f32[3]) fusion(%a, %b)")


def test_control_flow_span_with_layout_annotated_shape():
    """TPU shapes can carry layout annotations that EMBED parentheses in
    the whitespace-free shape token (``f32[8]{0:T(8,128)}``); the opcode
    must still be found as the token after the shape, so a renamed while
    stays excluded and a fusion with such a shape stays included
    (review r5)."""
    from tpuseg.utils.trace_analysis import is_control_flow_span

    assert is_control_flow_span(
        "%scan_loop = f32[8]{0:T(8,128)} while(%init)")
    assert is_control_flow_span(
        "%body = (s32[], f32[8]{0:T(8,128)}) while(%cond)")
    assert not is_control_flow_span(
        "%fusion.9 = f32[8]{0:T(8,128)} fusion(%a)")
    assert not is_control_flow_span(
        "%while_like = f32[8]{0:T(8,128)S(1)} fusion(%a)")
