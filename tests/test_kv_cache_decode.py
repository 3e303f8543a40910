"""Autoregressive KV-cache decoding graphs through the engine.

The reference consumes whatever inference graph the user hands it via ort
(src/classifier.rs:348-350); a standard real-world shape it would accept is
the decoder *step* graph that generation stacks export — past key/values as
explicit inputs, updated presents as extra outputs, a one-token query
attending over the concatenated cache. These tests export exactly that from
a genuine HF GPT-2 through libtorch's serializer (bytes never touch the
repo encoder) and require:

1. a single incremental step (past length 5, query length 1) to match
   torch on the hidden state AND all four present-KV outputs, and
2. a full greedy decode loop — prompt step then incremental steps where the
   engine's own presents feed the next step's pasts — to match torch's
   per-step logits and chosen tokens. Each past length is its own static
   shape, so every step jits a fixed-shape program (the same
   pad-don't-recompile discipline the batch context uses; here lengths
   genuinely differ so separate programs are correct).

Engine-side cache-update machinery (TensorScatter, opset 24) is covered in
test_external_onnx.py; this file proves the end-to-end decode protocol.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402

from _torch_export import export_onnx_bytes, torch_outputs  # noqa: E402
from birdnet_tpu.compiler.importer import import_onnx, make_forward  # noqa: E402

ATOL = 1e-4


def _tiny_gpt2_lm():
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=100,
        n_positions=64, attn_implementation="eager",
    )
    return GPT2LMHeadModel(cfg)


class _Step(torch.nn.Module):
    """One decode step: explicit past KV in, logits + presents out."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, pk0, pv0, pk1, pv1):
        from transformers.cache_utils import DynamicCache

        past = DynamicCache()
        past.update(pk0, pv0, 0)
        past.update(pk1, pv1, 1)
        out = self.m(input_ids=ids, past_key_values=past, use_cache=True)
        pres = out.past_key_values
        return (
            out.logits,
            pres.layers[0].keys, pres.layers[0].values,
            pres.layers[1].keys, pres.layers[1].values,
        )


def _run_engine_step(step, args):
    data = export_onnx_bytes(step, args, opset_version=17)
    model = import_onnx(data)
    fwd = jax.jit(make_forward(model, precision="fp32"))
    return fwd(model.params, *[np.asarray(a) for a in args])


class _Prompt(torch.nn.Module):
    """The prompt (no-past) step: logits + fresh presents."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids):
        out = self.m(input_ids=ids, use_cache=True)
        pres = out.past_key_values
        return (
            out.logits,
            pres.layers[0].keys, pres.layers[0].values,
            pres.layers[1].keys, pres.layers[1].values,
        )


_OUTS = ["logits", "k0", "v0", "k1", "v1"]
_PAST_NAMES = ["pk0", "pv0", "pk1", "pv1"]


def _merged_decoder_model(no_past_bytes: bytes, with_past_bytes: bytes):
    """Assemble an optimum-style ``decoder_model_merged.onnx``: one If gated
    on a ``use_cache_branch`` input whose then-branch is the with-past graph
    and else-branch the no-past graph, both referencing the shared outer
    inputs by closure capture (each export used the same input/output
    names). The branches return shape-divergent outputs — exactly the file
    class ORT accepts whole (reference: src/classifier.rs:348-350) and that
    auto-specialization recovers with zero user flags."""
    from birdnet_tpu.onnx import proto as P

    then_g = P.decode_model(with_past_bytes).graph
    else_g = P.decode_model(no_past_bytes).graph
    # If branches have no formal inputs; values bind by outer-scope name.
    then_g.input = []
    else_g.input = []
    node = P.make_node(
        "If", ["use_cache_branch"], _OUTS,
        then_branch=then_g, else_branch=else_g,
    )
    F, I, B = P.DataType.FLOAT, P.DataType.INT64, P.DataType.BOOL
    inputs = [
        P.make_value_info("ids", I, [1, "seq"]),
        P.make_value_info("use_cache_branch", B, [1]),
    ] + [P.make_value_info(n, F, [1, 2, "past", 16]) for n in _PAST_NAMES]
    outputs = [P.make_value_info(n, F, []) for n in _OUTS]
    graph = P.GraphProto(
        name="decoder_model_merged", node=[node],
        input=inputs, output=outputs,
    )
    return P.ModelProto(
        ir_version=8, producer_name="optimum-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17)],
    )


def test_merged_decoder_auto_specialization_matches_split_pair():
    """The merged file loads via PLAIN import_onnx (zero freeze_inputs),
    auto-detects ``use_cache_branch`` as a dispatch flag, and its greedy
    decode trajectory matches the split decoder / decoder_with_past pair
    per step — logits, chosen tokens, and present-KV tensors — which in
    turn match torch."""
    torch.manual_seed(22)
    lm = _tiny_gpt2_lm()
    lm.eval()
    prompt = torch.randint(0, 100, (1, 4))
    pasts5 = [torch.randn(1, 2, 5, 16) for _ in range(4)]
    dyn_step = {"ids": {1: "seq"}}
    dyn_step.update({n: {2: "past"} for n in _PAST_NAMES})

    no_past_bytes = export_onnx_bytes(
        _Prompt(lm), (prompt,), opset_version=17,
        input_names=["ids"], output_names=_OUTS,
        dynamic_axes={"ids": {1: "seq"}},
    )
    with_past_bytes = export_onnx_bytes(
        _Step(lm), (torch.randint(0, 100, (1, 1)), *pasts5),
        opset_version=17, input_names=["ids"] + _PAST_NAMES,
        output_names=_OUTS, dynamic_axes=dyn_step,
    )

    merged = import_onnx(_merged_decoder_model(no_past_bytes, with_past_bytes))
    assert merged.dispatch_inputs == ["use_cache_branch"]
    assert merged.input_names == ["ids", "use_cache_branch"] + _PAST_NAMES
    mfwd = make_forward(merged, precision="fp32")

    split_np = import_onnx(no_past_bytes)
    split_wp = import_onnx(with_past_bytes)
    sfwd_np = jax.jit(make_forward(split_np, precision="fp32"))
    sfwd_wp = jax.jit(make_forward(split_wp, precision="fp32"))

    # torch ground-truth trajectory
    from transformers.cache_utils import DynamicCache

    torch_logits, torch_toks = [], []
    with torch.no_grad():
        ids, past = prompt, None
        for _ in range(3):
            out = lm(
                input_ids=ids,
                past_key_values=past if past is not None else DynamicCache(),
                use_cache=True,
            )
            past = out.past_key_values
            torch_logits.append(out.logits[:, -1].numpy().copy())
            tok = out.logits[:, -1].argmax(-1, keepdim=True)
            torch_toks.append(int(tok))
            ids = tok

    ids = np.asarray(prompt)
    m_pasts = [np.zeros((1, 2, 0, 16), np.float32) for _ in range(4)]
    s_pasts = None
    m_toks, s_toks = [], []
    for t in range(3):
        use_cache = t > 0
        m_outs = mfwd(
            merged.params, ids, np.array([use_cache]), *m_pasts
        )
        if use_cache:
            s_outs = sfwd_wp(split_wp.params, ids, *s_pasts)
        else:
            s_outs = sfwd_np(split_np.params, ids)
        # merged == split pair, exactly (same graphs, same precision)
        for m_o, s_o in zip(m_outs, s_outs):
            np.testing.assert_allclose(
                np.asarray(m_o), np.asarray(s_o), atol=1e-6, rtol=1e-6
            )
        logits = np.asarray(m_outs[0])[:, -1]
        np.testing.assert_allclose(
            logits, torch_logits[t], atol=ATOL, rtol=1e-3
        )
        nxt = int(logits[0].argmax())
        m_toks.append(nxt)
        s_toks.append(int(np.asarray(s_outs[0])[0, -1].argmax()))
        m_pasts = [np.asarray(o) for o in m_outs[1:]]
        s_pasts = [np.asarray(o) for o in s_outs[1:]]
        ids = np.array([[nxt]])

    assert m_toks == torch_toks
    assert s_toks == torch_toks


def test_incremental_step_updates_kv_cache():
    torch.manual_seed(20)
    step = _Step(_tiny_gpt2_lm())
    step.eval()
    ids = torch.randint(0, 100, (2, 1))
    pasts = [torch.randn(2, 2, 5, 16) for _ in range(4)]
    args = (ids, *pasts)

    outs = _run_engine_step(step, args)
    refs = torch_outputs(step, args)
    assert len(outs) == 5
    # present KV must be [B, H, 6, D]: the 5 past positions plus the query
    for got in outs[1:]:
        assert np.asarray(got).shape == (2, 2, 6, 16)
    for got, ref in zip(outs, refs):
        np.testing.assert_allclose(np.asarray(got), ref, atol=ATOL, rtol=1e-3)


def test_greedy_decode_loop_matches_torch():
    torch.manual_seed(21)
    lm = _tiny_gpt2_lm()
    lm.eval()
    step = _Step(lm)
    prompt = torch.randint(0, 100, (1, 4))
    n_steps = 3  # prompt step + 2 incremental steps

    # torch trajectory
    torch_logits, torch_toks = [], []
    with torch.no_grad():
        ids, past = prompt, None
        from transformers.cache_utils import DynamicCache

        for _ in range(n_steps):
            out = lm(
                input_ids=ids,
                past_key_values=past if past is not None else DynamicCache(),
                use_cache=True,
            )
            past = out.past_key_values
            torch_logits.append(out.logits[:, -1].numpy().copy())
            tok = out.logits[:, -1].argmax(-1, keepdim=True)
            torch_toks.append(int(tok))
            ids = tok

    # engine trajectory: presents feed the next step's pasts
    ids = prompt
    pasts = [torch.zeros(1, 2, 0, 16) for _ in range(4)]
    engine_toks = []
    for t in range(n_steps):
        outs = _run_engine_step(step, (ids, *pasts))
        logits = np.asarray(outs[0])[:, -1]
        np.testing.assert_allclose(
            logits, torch_logits[t], atol=ATOL, rtol=1e-3
        )
        nxt = int(logits[0].argmax())
        engine_toks.append(nxt)
        pasts = [torch.from_numpy(np.asarray(o).copy()) for o in outs[1:]]
        ids = torch.tensor([[nxt]])

    assert engine_toks == torch_toks
