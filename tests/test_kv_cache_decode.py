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

import os

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


# ---------------------------------------------------------------------------
# Encoder-decoder cache topology (round-3 verdict item 2): Whisper
# decoder_with_past — STATIC cross-attention caches (computed once at
# prefill, reused unchanged every step) + GROWING self-attention caches.
# A different cache topology than GPT-2's single growing cache, and the
# actual audio-domain decode artifact (optimum exports exactly this split
# for Whisper; reference consumes it via ort, src/classifier.rs:348-350).
# ---------------------------------------------------------------------------


def _tiny_whisper():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    cfg = WhisperConfig(
        vocab_size=100, d_model=32, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_mel_bins=8,
        max_source_positions=25, max_target_positions=32,
        attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    return WhisperForConditionalGeneration(cfg)


class _WhisperEncoder(torch.nn.Module):
    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, feats):
        return self.m.model.encoder(feats).last_hidden_state


class _WhisperPrefill(torch.nn.Module):
    """First decoder call: computes BOTH cache kinds from scratch and
    returns them (optimum's decoder_model.onnx for Whisper)."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, enc):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        cache = EncoderDecoderCache(DynamicCache(), DynamicCache())
        out = self.m.model.decoder(
            input_ids=ids, encoder_hidden_states=enc,
            past_key_values=cache, use_cache=True,
        )
        logits = self.m.proj_out(out.last_hidden_state)
        sa = out.past_key_values.self_attention_cache
        ca = out.past_key_values.cross_attention_cache
        return (
            logits,
            sa.layers[0].keys, sa.layers[0].values,
            sa.layers[1].keys, sa.layers[1].values,
            ca.layers[0].keys, ca.layers[0].values,
            ca.layers[1].keys, ca.layers[1].values,
        )


class _WhisperStep(torch.nn.Module):
    """With-past decoder step: self caches grow, cross caches are STATIC
    inputs reused via is_updated (optimum's decoder_with_past_model.onnx)."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, enc, sk0, sv0, sk1, sv1, ck0, cv0, ck1, cv1):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        sa, ca = DynamicCache(), DynamicCache()
        sa.update(sk0, sv0, 0)
        sa.update(sk1, sv1, 1)
        ca.update(ck0, cv0, 0)
        ca.update(ck1, cv1, 1)
        # EncoderDecoderCache marks cross layers is_updated (seq > 0), so
        # the decoder REUSES them instead of recomputing from enc.
        cache = EncoderDecoderCache(sa, ca)
        out = self.m.model.decoder(
            input_ids=ids, encoder_hidden_states=enc,
            past_key_values=cache, use_cache=True,
        )
        logits = self.m.proj_out(out.last_hidden_state)
        sa = out.past_key_values.self_attention_cache
        return (
            logits,
            sa.layers[0].keys, sa.layers[0].values,
            sa.layers[1].keys, sa.layers[1].values,
        )


def _run_engine_step_named(mod, args, names):
    """Like _run_engine_step, but tolerant of the exporter PRUNING unused
    inputs — the with-past Whisper step never reads ``enc`` (cross caches
    are reused, the point of the topology), so libtorch drops it from the
    graph, exactly as optimum's decoder_with_past_model.onnx omits
    encoder_hidden_states."""
    data = export_onnx_bytes(
        mod, args, opset_version=17, input_names=list(names)
    )
    model = import_onnx(data)
    by_name = dict(zip(names, args))
    fwd = jax.jit(make_forward(model, precision="fp32"))
    return model, fwd(
        model.params, *[np.asarray(by_name[n]) for n in model.input_names]
    )


def test_whisper_encoder_decoder_kv_protocol():
    """Greedy transcription loop through the engine: encoder once, prefill
    once, then with-past steps where the engine's growing self caches and
    its STATIC cross caches feed each next step — per-step logits, chosen
    tokens, and cache tensors all match torch."""
    torch.manual_seed(30)
    m = _tiny_whisper()
    m.eval()
    feats = torch.randn(1, 8, 50) * 0.5
    prompt = torch.tensor([[5, 7, 9]])  # decoder prompt (BOS-ish)
    n_steps = 3  # prefill + 2 incremental

    # --- torch ground truth (top-level decoder loop, EncoderDecoderCache)
    from transformers.cache_utils import DynamicCache, EncoderDecoderCache

    torch_logits, torch_toks = [], []
    with torch.no_grad():
        enc_t = m.model.encoder(feats).last_hidden_state
        cache = EncoderDecoderCache(DynamicCache(), DynamicCache())
        ids = prompt
        for _ in range(n_steps):
            out = m.model.decoder(
                input_ids=ids, encoder_hidden_states=enc_t,
                past_key_values=cache, use_cache=True,
            )
            cache = out.past_key_values
            logits = m.proj_out(out.last_hidden_state)
            torch_logits.append(logits[:, -1].numpy().copy())
            tok = int(logits[:, -1].argmax())
            torch_toks.append(tok)
            ids = torch.tensor([[tok]])

    # --- engine trajectory
    enc_mod = _WhisperEncoder(m)
    enc = np.asarray(_run_engine_step(enc_mod, (feats,))[0])
    np.testing.assert_allclose(enc, enc_t.numpy(), atol=ATOL, rtol=1e-3)

    prefill = _WhisperPrefill(m)
    outs = _run_engine_step(prefill, (prompt, torch.from_numpy(enc)))
    logits = np.asarray(outs[0])[:, -1]
    np.testing.assert_allclose(logits, torch_logits[0], atol=ATOL, rtol=1e-3)
    self_kv = [torch.from_numpy(np.asarray(o).copy()) for o in outs[1:5]]
    cross_kv = [torch.from_numpy(np.asarray(o).copy()) for o in outs[5:9]]
    # cross caches span the full encoder length; self caches the prompt
    assert cross_kv[0].shape == (1, 2, 25, 16)
    assert self_kv[0].shape == (1, 2, 3, 16)
    engine_toks = [int(logits[0].argmax())]

    step = _WhisperStep(m)
    enc_in = torch.from_numpy(enc)
    step_names = ["ids", "enc", "sk0", "sv0", "sk1", "sv1",
                  "ck0", "cv0", "ck1", "cv1"]
    for t in range(1, n_steps):
        ids = torch.tensor([[engine_toks[-1]]])
        step_model, outs = _run_engine_step_named(
            step, (ids, enc_in, *self_kv, *cross_kv), step_names
        )
        if t == 1:
            # the exporter pruned the unused encoder input: cross caches
            # are genuinely REUSED, not recomputed (static topology)
            assert "enc" not in step_model.input_names
        logits = np.asarray(outs[0])[:, -1]
        np.testing.assert_allclose(
            logits, torch_logits[t], atol=ATOL, rtol=1e-3
        )
        new_self = [torch.from_numpy(np.asarray(o).copy()) for o in outs[1:5]]
        # self caches grew by exactly one position
        assert new_self[0].shape[2] == self_kv[0].shape[2] + 1
        self_kv = new_self
        engine_toks.append(int(logits[0].argmax()))

    assert engine_toks == torch_toks
    # torch's final self-cache agrees with the engine's (same topology)
    ref_sa = cache.self_attention_cache
    np.testing.assert_allclose(
        self_kv[0].numpy(), ref_sa.layers[0].keys.numpy(),
        atol=ATOL, rtol=1e-3,
    )
    # and the cross caches the engine carried are torch's, bit-comparable
    ref_ca = cache.cross_attention_cache
    np.testing.assert_allclose(
        cross_kv[0].numpy(), ref_ca.layers[0].keys.numpy(),
        atol=ATOL, rtol=1e-3,
    )


# ---------------------------------------------------------------------------
# onnxruntime-genai-style artifact: the SAME decode-step graph with its
# projection weights stored as 4-bit MatMulNBits blocks (weight-only
# quantization), run through the full KV protocol. The quantized file must
# match a float twin whose weights are the dequantized blocks — bit-level
# same effective math — per step, including chosen tokens.
# ---------------------------------------------------------------------------


def _nbits_quantize_graph(model_bytes: bytes, block_size: int = 16):
    """Replace every initializer-weighted Gemm/MatMul in the exported step
    graph with a 4-bit MatMulNBits node (symmetric, zp=8 default, packed
    low-nibble-first), exactly how genai exports store LLM projections.
    Returns (quantized ModelProto, float ModelProto with dequantized
    weights, n_replaced)."""
    from birdnet_tpu.onnx import proto as P

    qm = P.decode_model(model_bytes)
    fm = P.decode_model(model_bytes)
    q_inits = {t.name: t for t in qm.graph.initializer}
    f_inits = {t.name: t for t in fm.graph.initializer}

    def pack_nibbles(vals):
        v = np.asarray(vals, np.uint8) & 0x0F
        if v.shape[-1] % 2:
            v = np.concatenate(
                [v, np.zeros(v.shape[:-1] + (1,), np.uint8)], -1
            )
        return (v[..., 0::2] | (v[..., 1::2] << 4)).astype(np.uint8)

    def tensor(name, arr):
        return P.TensorProto(
            name=name, data_type=P.DataType.UINT8 if arr.dtype == np.uint8
            else P.DataType.FLOAT,
            dims=list(arr.shape), raw_data=arr.tobytes(),
        )

    n_replaced = 0
    for qnode in qm.graph.node:
        if qnode.op_type not in ("Gemm", "MatMul"):
            continue
        w_name = qnode.input[1]
        if w_name not in q_inits:
            continue
        if qnode.op_type == "Gemm":
            attrs = {a.name: a for a in qnode.attribute}
            if any(k in attrs for k in ("transA", "transB")):
                continue  # only the plain orientation is surgered here
        w = q_inits[w_name].to_numpy().astype(np.float32)  # [K, N]
        if w.ndim != 2 or w.shape[0] % block_size:
            continue
        k_dim, n_dim = w.shape
        wt = np.ascontiguousarray(w.T)  # [N, K] — MatMulNBits layout
        nb = k_dim // block_size
        blocks = wt.reshape(n_dim, nb, block_size)
        scales = (np.abs(blocks).max(-1) / 7.0 + 1e-8).astype(np.float32)
        q = np.clip(
            np.rint(blocks / scales[..., None]) + 8, 0, 15
        ).astype(np.uint8)
        wdq_t = ((q.astype(np.float32) - 8.0) * scales[..., None]).reshape(
            n_dim, k_dim
        )

        # quantized model: swap the node + initializers
        bias = list(qnode.input[2:3])  # Gemm's C, if present
        qnode.op_type = "MatMulNBits"
        qnode.domain = "com.microsoft"
        qnode.input = [qnode.input[0], w_name + "_q", w_name + "_s",
                       "", ""] + bias
        qnode.attribute = [
            P.make_attr("K", k_dim), P.make_attr("N", n_dim),
            P.make_attr("bits", 4), P.make_attr("block_size", block_size),
        ]
        qm.graph.initializer.remove(q_inits[w_name])
        qm.graph.initializer.append(tensor(w_name + "_q", pack_nibbles(q)))
        qm.graph.initializer.append(tensor(w_name + "_s", scales))

        # float twin: same effective weights, plain Gemm/MatMul
        f_inits[w_name].raw_data = np.ascontiguousarray(
            wdq_t.T
        ).tobytes()
        f_inits[w_name].float_data = []
        n_replaced += 1

    qm.opset_import.append(P.OperatorSetId(domain="com.microsoft", version=1))
    return qm, fm, n_replaced


def test_genai_style_nbits_decode_matches_dequantized_twin():
    torch.manual_seed(33)
    lm = _tiny_gpt2_lm()
    lm.eval()
    step = _Step(lm)
    ids0 = torch.randint(0, 100, (1, 1))
    pasts = [torch.randn(1, 2, 4, 16) * 0.5 for _ in range(4)]
    dyn = {"ids": {1: "seq"}}
    dyn.update({n: {2: "past"} for n in _PAST_NAMES})
    data = export_onnx_bytes(
        step, (ids0, *pasts), opset_version=17,
        input_names=["ids"] + _PAST_NAMES, output_names=_OUTS,
        dynamic_axes=dyn,
    )

    qm, fm, n_replaced = _nbits_quantize_graph(data)
    assert n_replaced == 9  # 8 Gemm projections + the lm_head MatMul

    q_model = import_onnx(qm)
    f_model = import_onnx(fm)
    q_fwd = jax.jit(make_forward(q_model, precision="fp32"))
    f_fwd = jax.jit(make_forward(f_model, precision="fp32"))

    # 3 incremental steps: presents feed the next pasts in BOTH engines;
    # the quantized file and its dequantized float twin must stay equal.
    q_pasts = [np.asarray(p) for p in pasts]
    f_pasts = [np.asarray(p) for p in pasts]
    ids = np.asarray(ids0)
    for t in range(3):
        q_outs = q_fwd(q_model.params, ids, *q_pasts)
        f_outs = f_fwd(f_model.params, ids, *f_pasts)
        for q_o, f_o in zip(q_outs, f_outs):
            np.testing.assert_allclose(
                np.asarray(q_o), np.asarray(f_o), atol=2e-4, rtol=1e-3
            )
        q_tok = int(np.asarray(q_outs[0])[0, -1].argmax())
        f_tok = int(np.asarray(f_outs[0])[0, -1].argmax())
        assert q_tok == f_tok
        q_pasts = [np.asarray(o) for o in q_outs[1:]]
        f_pasts = [np.asarray(o) for o in f_outs[1:]]
        ids = np.array([[q_tok]])


# ---------------------------------------------------------------------------
# Combined genai artifact (round-4 verdict item 7): ONE merged-decoder file
# stacking every mechanism previously proven separately — an If gated on
# ``use_cache_branch`` (auto-dispatch, zero user flags), explicit
# com.microsoft RotaryEmbedding nodes in the scalar-offset decode idiom,
# GroupQueryAttention with grouped KV heads and past/present caches, and
# every projection stored as 4-bit MatMulNBits blocks — hand-built through
# the wire codec the way onnxruntime-genai exports llama-family models
# (reference consumes such files whole via ort, src/classifier.rs:348-350).
# The quantized merged file must match its float twin (same graphs, MatMul
# on the dequantized blocks) per decode step, and the float merged file
# must match the float split prompt/step pair exactly.
# ---------------------------------------------------------------------------

_G_DIMS = dict(V=50, D=32, N=4, KVN=2, H=8, F=64, BLOCK=16, MAXPOS=32)
_G_MS = "com.microsoft"


def _quant4(w_t: np.ndarray, block: int, zp: np.ndarray | None = None):
    """4-bit block quantization of W.T [N, K]: returns (packed nibbles
    [N, nb, block/2], scales [N, nb], dequantized W [K, N]). Symmetric
    (zp=8 implicit) when ``zp`` is None; otherwise ``zp`` [N, nb] uint8
    in 0..15 is the per-block zero point (the asymmetric MatMulNBits
    form with an explicit zero_points input)."""
    n, k = w_t.shape
    nb = k // block
    blocks = w_t.reshape(n, nb, block)
    scales = (np.abs(blocks).max(-1) / 7.0 + 1e-8).astype(np.float32)
    zp_e = 8.0 if zp is None else zp[..., None].astype(np.float32)
    q = np.clip(
        np.rint(blocks / scales[..., None]) + zp_e, 0, 15
    ).astype(np.uint8)
    packed = (q[..., 0::2] | (q[..., 1::2] << 4)).astype(np.uint8)
    wdq = ((q.astype(np.float32) - zp_e) * scales[..., None]).reshape(n, k)
    return packed, scales, np.ascontiguousarray(wdq.T)


def _pack_zp_nibbles(zp: np.ndarray) -> np.ndarray:
    """MatMulNBits zero_points wire layout: each row's blocks packed as
    nibbles, padded to a byte boundary per row ([N, ceil(nb/2)] uint8)."""
    n, nb = zp.shape
    if nb % 2:
        zp = np.concatenate([zp, np.zeros((n, 1), np.uint8)], axis=1)
    return (zp[:, 0::2] | (zp[:, 1::2] << 4)).astype(np.uint8)


def _genai_weights(seed=44, dims=None, asym_zp=False, quant_emb=False):
    """Float weights + their quantized forms for the one-layer llama-style
    decoder. Every projection is block-quantized once here so the
    quantized graph and its float twin share the exact effective math.
    ``dims`` overrides the default geometry (fuzz tier); ``asym_zp``
    stores explicit per-block zero points instead of the implicit 8;
    ``quant_emb`` stores the embedding table 4-bit too, looked up via
    GatherBlockQuantized (genai exports quantize embeddings this way)."""
    d = dict(_G_DIMS, **(dims or {}))
    assert d["N"] * d["H"] == d["D"] and d["N"] % d["KVN"] == 0
    r = np.random.default_rng(seed)

    def w(k, n):
        return (r.standard_normal((k, n)) / np.sqrt(k)).astype(np.float32)

    proj = {
        "Wq": w(d["D"], d["N"] * d["H"]), "Wk": w(d["D"], d["KVN"] * d["H"]),
        "Wv": w(d["D"], d["KVN"] * d["H"]), "Wo": w(d["N"] * d["H"], d["D"]),
        "Wg": w(d["D"], d["F"]), "Wu": w(d["D"], d["F"]),
        "Wd": w(d["F"], d["D"]), "Wlm": w(d["D"], d["V"]),
    }
    quant = {}
    for name, W in proj.items():
        wt = np.ascontiguousarray(W.T)
        zp = None
        if asym_zp:
            zp = r.integers(5, 12, (wt.shape[0], wt.shape[1] // d["BLOCK"]),
                            dtype=np.uint8)
        packed, scales, wdq = _quant4(wt, d["BLOCK"], zp)
        quant[name] = (packed, scales, wdq, zp)
    emb = (r.standard_normal((d["V"], d["D"])) * 0.3).astype(np.float32)
    equant = None
    if quant_emb:
        packed, scales, edq_t = _quant4(emb, d["BLOCK"])  # rows are "N"
        # GatherBlockQuantized wire layout: nibble pairs packed flat
        # along the quantize axis → [V, D/2] uint8; scales [V, D/block].
        equant = (packed.reshape(d["V"], d["D"] // 2), scales)
        emb = np.ascontiguousarray(edq_t.T)  # dequantized twin [V, D]
    inv = 1.0 / (10000.0 ** (np.arange(d["H"] // 2) / (d["H"] // 2)))
    ang = np.arange(d["MAXPOS"])[:, None] * inv[None]
    return {
        "dims": d,
        "quant": quant,
        "equant": equant,
        "E": emb,
        "g1": (1.0 + 0.1 * r.standard_normal(d["D"])).astype(np.float32),
        "g2": (1.0 + 0.1 * r.standard_normal(d["D"])).astype(np.float32),
        "g3": (1.0 + 0.1 * r.standard_normal(d["D"])).astype(np.float32),
        "cos": np.cos(ang).astype(np.float32),
        "sin": np.sin(ang).astype(np.float32),
        "interleaved": bool(asym_zp),  # fuzz flips both forms across seeds
    }


def _genai_branch(w, *, with_past: bool, quantize: bool):
    """One llama-style decoder layer + lm head as a GraphProto whose
    inputs bind by OUTER name (If-branch convention): ids always; pk, pv,
    seqlens, total, pos only on the with-past branch. Outputs logits,
    present_k, present_v."""
    from birdnet_tpu.onnx import proto as P

    d = w["dims"]
    tag = "s" if with_past else "p"
    nodes, inits = [], []

    def mm(x_name, w_name, out_name):
        packed, scales, wdq, zp = w["quant"][w_name]
        n_dim, k_dim = packed.shape[0], wdq.shape[0]
        if quantize:
            inits.append(P.TensorProto(
                name=f"{w_name}_{tag}_q", data_type=P.DataType.UINT8,
                dims=list(packed.shape), raw_data=packed.tobytes(),
            ))
            inits.append(P.TensorProto(
                name=f"{w_name}_{tag}_s", data_type=P.DataType.FLOAT,
                dims=list(scales.shape), raw_data=scales.tobytes(),
            ))
            mm_in = [x_name, f"{w_name}_{tag}_q", f"{w_name}_{tag}_s"]
            if zp is not None:
                zpk = _pack_zp_nibbles(zp)
                inits.append(P.TensorProto(
                    name=f"{w_name}_{tag}_z", data_type=P.DataType.UINT8,
                    dims=list(zpk.shape), raw_data=zpk.tobytes(),
                ))
                mm_in.append(f"{w_name}_{tag}_z")
            nodes.append(P.make_node(
                "MatMulNBits", mm_in, [out_name], domain=_G_MS,
                K=k_dim, N=n_dim, bits=4, block_size=d["BLOCK"],
            ))
        else:
            inits.append(P.TensorProto(
                name=f"{w_name}_{tag}", data_type=P.DataType.FLOAT,
                dims=list(wdq.shape), raw_data=wdq.tobytes(),
            ))
            nodes.append(P.make_node(
                "MatMul", [x_name, f"{w_name}_{tag}"], [out_name]
            ))

    def t(name, arr):
        arr = np.asarray(arr)
        dt = {np.dtype(np.float32): P.DataType.FLOAT,
              np.dtype(np.int64): P.DataType.INT64,
              np.dtype(np.uint8): P.DataType.UINT8}[arr.dtype]
        return P.TensorProto(name=name, data_type=dt, dims=list(arr.shape),
                             raw_data=arr.tobytes())

    inits += [t(f"g1_{tag}", w["g1"]),
              t(f"g2_{tag}", w["g2"]), t(f"g3_{tag}", w["g3"]),
              t(f"cos_{tag}", w["cos"]), t(f"sin_{tag}", w["sin"])]

    if quantize and w.get("equant") is not None:
        packed, scales = w["equant"]
        inits += [t(f"E_{tag}_q", packed), t(f"E_{tag}_s", scales)]
        nodes.append(P.make_node(
            "GatherBlockQuantized",
            [f"E_{tag}_q", "ids", f"E_{tag}_s"], [f"x_{tag}"],
            domain=_G_MS, gather_axis=0, quantize_axis=1,
            block_size=d["BLOCK"],
        ))
    else:
        inits.append(t(f"E_{tag}", w["E"]))
        nodes.append(P.make_node("Gather", [f"E_{tag}", "ids"], [f"x_{tag}"]))
    nodes.append(P.make_node(
        "SimplifiedLayerNormalization", [f"x_{tag}", f"g1_{tag}"],
        [f"n1_{tag}"], axis=-1, epsilon=1e-5,
    ))
    mm(f"n1_{tag}", "Wq", f"q_{tag}")
    mm(f"n1_{tag}", "Wk", f"k_{tag}")
    mm(f"n1_{tag}", "Wv", f"v_{tag}")
    if with_past:
        pos_name = "pos"
    else:
        inits.append(t(f"pos0_{tag}", np.zeros(1, np.int64)))
        pos_name = f"pos0_{tag}"
    ileave = int(w.get("interleaved", False))
    nodes.append(P.make_node(
        "RotaryEmbedding", [f"q_{tag}", pos_name, f"cos_{tag}", f"sin_{tag}"],
        [f"qr_{tag}"], domain=_G_MS, num_heads=d["N"], interleaved=ileave,
    ))
    nodes.append(P.make_node(
        "RotaryEmbedding", [f"k_{tag}", pos_name, f"cos_{tag}", f"sin_{tag}"],
        [f"kr_{tag}"], domain=_G_MS, num_heads=d["KVN"], interleaved=ileave,
    ))
    gqa_in = [f"qr_{tag}", f"kr_{tag}", f"v_{tag}"]
    if with_past:
        gqa_in += ["pk", "pv", "seqlens", "total"]
    nodes.append(P.make_node(
        "GroupQueryAttention", gqa_in,
        [f"attn_{tag}", "present_k", "present_v"], domain=_G_MS,
        num_heads=d["N"], kv_num_heads=d["KVN"],
    ))
    mm(f"attn_{tag}", "Wo", f"ao_{tag}")
    nodes.append(P.make_node("Add", [f"x_{tag}", f"ao_{tag}"], [f"x2_{tag}"]))
    nodes.append(P.make_node(
        "SimplifiedLayerNormalization", [f"x2_{tag}", f"g2_{tag}"],
        [f"n2_{tag}"], axis=-1, epsilon=1e-5,
    ))
    mm(f"n2_{tag}", "Wg", f"gate_{tag}")
    mm(f"n2_{tag}", "Wu", f"up_{tag}")
    nodes.append(P.make_node("Sigmoid", [f"gate_{tag}"], [f"sg_{tag}"]))
    nodes.append(P.make_node(
        "Mul", [f"gate_{tag}", f"sg_{tag}"], [f"silu_{tag}"]
    ))
    nodes.append(P.make_node(
        "Mul", [f"silu_{tag}", f"up_{tag}"], [f"h_{tag}"]
    ))
    mm(f"h_{tag}", "Wd", f"down_{tag}")
    nodes.append(P.make_node(
        "Add", [f"x2_{tag}", f"down_{tag}"], [f"x3_{tag}"]
    ))
    nodes.append(P.make_node(
        "SimplifiedLayerNormalization", [f"x3_{tag}", f"g3_{tag}"],
        [f"n3_{tag}"], axis=-1, epsilon=1e-5,
    ))
    mm(f"n3_{tag}", "Wlm", "logits")

    F = P.DataType.FLOAT
    outputs = [
        P.make_value_info("logits", F, [1, "seq", d["V"]]),
        P.make_value_info("present_k", F, [1, d["KVN"], "total", d["H"]]),
        P.make_value_info("present_v", F, [1, d["KVN"], "total", d["H"]]),
    ]
    return P.GraphProto(
        name=f"genai_{'step' if with_past else 'prompt'}",
        node=nodes, input=[], output=outputs, initializer=inits,
    )


def _genai_model(graph_nodes, inputs, outputs, *, initializers=()):
    from birdnet_tpu.onnx import proto as P

    graph = P.GraphProto(
        name="genai_combined", node=list(graph_nodes), input=inputs,
        output=outputs, initializer=list(initializers),
    )
    m = P.ModelProto(
        ir_version=8, producer_name="onnxruntime-genai-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=_G_MS, version=1)],
    )
    return P.decode_model(P.encode_model(m))


def _genai_merged(w, *, quantize: bool):
    from birdnet_tpu.onnx import proto as P

    d = w["dims"]
    then_g = _genai_branch(w, with_past=True, quantize=quantize)
    else_g = _genai_branch(w, with_past=False, quantize=quantize)
    node = P.make_node(
        "If", ["use_cache_branch"], ["logits", "present_k", "present_v"],
        then_branch=then_g, else_branch=else_g,
    )
    F, I, B = P.DataType.FLOAT, P.DataType.INT64, P.DataType.BOOL
    I32 = P.DataType.INT32
    inputs = [
        P.make_value_info("ids", I, [1, "seq"]),
        P.make_value_info("use_cache_branch", B, [1]),
        P.make_value_info("pk", F, [1, d["KVN"], "past", d["H"]]),
        P.make_value_info("pv", F, [1, d["KVN"], "past", d["H"]]),
        P.make_value_info("seqlens", I32, [1]),
        P.make_value_info("total", I32, [1]),
        P.make_value_info("pos", I, [1]),
    ]
    outputs = [
        P.make_value_info("logits", F, []),
        P.make_value_info("present_k", F, []),
        P.make_value_info("present_v", F, []),
    ]
    return _genai_model([node], inputs, outputs)


def _genai_split(w, *, with_past: bool, quantize: bool):
    """The same branch as a standalone (non-merged) model file."""
    from birdnet_tpu.onnx import proto as P

    d = w["dims"]
    g = _genai_branch(w, with_past=with_past, quantize=quantize)
    F, I, I32 = P.DataType.FLOAT, P.DataType.INT64, P.DataType.INT32
    inputs = [P.make_value_info("ids", I, [1, "seq"])]
    if with_past:
        inputs += [
            P.make_value_info("pk", F, [1, d["KVN"], "past", d["H"]]),
            P.make_value_info("pv", F, [1, d["KVN"], "past", d["H"]]),
            P.make_value_info("seqlens", I32, [1]),
            P.make_value_info("total", I32, [1]),
            P.make_value_info("pos", I, [1]),
        ]
    return _genai_model(g.node, inputs, list(g.output),
                        initializers=g.initializer)


def _genai_run_loop(w, *, prompt_len=4, n_steps=4, check_split=True,
                    prompt_seed=7):
    """Greedy prompt + incremental decode through the quantized merged
    file, its float twin, and (optionally) the float split pair,
    asserting per-step equality of logits, present caches, and chosen
    tokens. Returns the token trajectory."""
    d = w["dims"]
    qm = import_onnx(_genai_merged(w, quantize=True))
    fm = import_onnx(_genai_merged(w, quantize=False))
    assert qm.dispatch_inputs == ["use_cache_branch"]
    assert fm.dispatch_inputs == ["use_cache_branch"]
    assert qm.input_names == [
        "ids", "use_cache_branch", "pk", "pv", "seqlens", "total", "pos"
    ]
    q_fwd = make_forward(qm, precision="fp32")
    f_fwd = make_forward(fm, precision="fp32")

    if check_split:
        sp = import_onnx(_genai_split(w, with_past=False, quantize=False))
        ss = import_onnx(_genai_split(w, with_past=True, quantize=False))
        sp_fwd = jax.jit(make_forward(sp, precision="fp32"))
        ss_fwd = make_forward(ss, precision="fp32")

    r = np.random.default_rng(prompt_seed)
    prompt = r.integers(0, d["V"], (1, prompt_len)).astype(np.int64)
    s0 = prompt.shape[1]

    ids = prompt
    q_pk = np.zeros((1, d["KVN"], 0, d["H"]), np.float32)
    q_pv = np.zeros((1, d["KVN"], 0, d["H"]), np.float32)
    f_pk, f_pv = q_pk, q_pv
    s_pk = s_pv = None
    toks_q, toks_f, toks_s = [], [], []
    for t in range(n_steps):
        use_cache = t > 0
        past = 0 if not use_cache else s0 + t - 1
        s_len = ids.shape[1]
        seqlens = np.array([past + s_len - 1], np.int32)
        total = np.array([past + s_len], np.int32)
        pos = np.array([past], np.int64)
        flag = np.array([use_cache])

        q_outs = q_fwd(qm.params, ids, flag, q_pk, q_pv, seqlens, total, pos)
        f_outs = f_fwd(fm.params, ids, flag, f_pk, f_pv, seqlens, total, pos)
        if check_split:
            if use_cache:
                s_outs = ss_fwd(
                    ss.params, ids, s_pk, s_pv, seqlens, total, pos
                )
            else:
                s_outs = sp_fwd(sp.params, ids)
            # float merged == float split pair, exactly (same graphs)
            for f_o, s_o in zip(f_outs, s_outs):
                np.testing.assert_allclose(
                    np.asarray(f_o), np.asarray(s_o), atol=1e-6, rtol=1e-6
                )
        # quantized == float twin (identical effective math; fp32 run)
        for q_o, f_o in zip(q_outs, f_outs):
            np.testing.assert_allclose(
                np.asarray(q_o), np.asarray(f_o), atol=2e-4, rtol=1e-3
            )

        toks_q.append(int(np.asarray(q_outs[0])[0, -1].argmax()))
        toks_f.append(int(np.asarray(f_outs[0])[0, -1].argmax()))
        if check_split:
            toks_s.append(int(np.asarray(s_outs[0])[0, -1].argmax()))
            s_pk, s_pv = np.asarray(s_outs[1]), np.asarray(s_outs[2])

        # caches grew to past + s_len on every path
        assert np.asarray(q_outs[1]).shape == (
            1, d["KVN"], past + s_len, d["H"]
        )
        q_pk, q_pv = np.asarray(q_outs[1]), np.asarray(q_outs[2])
        f_pk, f_pv = np.asarray(f_outs[1]), np.asarray(f_outs[2])
        ids = np.array([[toks_q[-1]]], np.int64)

    assert toks_q == toks_f
    if check_split:
        assert toks_q == toks_s
    return toks_q


def test_genai_combined_artifact_decode_loop():
    """The combined file imports with ZERO user flags (auto-detected
    ``use_cache_branch`` dispatch), runs a greedy prompt + 3-step decode
    loop, and matches its float twin per step — logits, present caches,
    and chosen tokens; the float merged file equals the float split pair
    exactly."""
    toks = _genai_run_loop(_genai_weights())
    assert len(set(toks)) > 1  # the loop actually moved through states


def test_genai_combined_artifact_fuzz():
    """Property fuzz over the combined-artifact geometry: random head
    counts / KV groupings / hidden sizes / block sizes / prompt lengths,
    alternating interleaved rotary and asymmetric (explicit zero-point)
    4-bit storage — each seed's quantized merged file must match its
    float twin per decode step. Widen with BIRDNET_GENAI_FUZZ_COUNT=N."""
    count = int(os.environ.get("BIRDNET_GENAI_FUZZ_COUNT", "4"))
    for seed in range(100, 100 + count):
        r = np.random.default_rng(seed)
        h = int(r.choice([4, 8, 16]))
        n = int(r.choice([2, 4]))
        if (n * h) % 16:  # MatMulNBits block_size is >= 16 in ORT exports
            h *= 2
        kvn = int(r.choice([g for g in (1, 2, 4) if n % g == 0]))
        d_model = n * h
        block = int(r.choice([b for b in (16, 32) if d_model % b == 0]))
        dims = dict(
            V=int(r.choice([37, 50])), D=d_model, N=n, KVN=kvn, H=h,
            F=2 * d_model, BLOCK=block, MAXPOS=32,
        )
        w = _genai_weights(seed=seed, dims=dims, asym_zp=bool(seed % 2),
                           quant_emb=(seed % 3 == 0))
        _genai_run_loop(
            w, prompt_len=int(r.integers(2, 6)), n_steps=3,
            check_split=False, prompt_seed=seed,
        )


# ---------------------------------------------------------------------------
# Real-width Whisper encoder-decoder decode (round-4 verdict item 6):
# whisper-tiny at its PUBLISHED config — d_model 384, 4 encoder + 4
# decoder layers, 6 heads, ffn 1536, 80 mel bins, 1500 source positions,
# vocab 51865 — through the same prefill + with-past greedy protocol the
# 32-dim test proves, matching torch per step. Slow tier (~40M params
# exported + imported at fp32), matching the GPT-2-124M / Wav2Vec2-base
# real-width precedent in tests/test_hf_architectures.py.
# ---------------------------------------------------------------------------


class _WhisperPrefillN(torch.nn.Module):
    """_WhisperPrefill generalized to n decoder layers: logits, then all
    self-cache (k,v) pairs, then all cross-cache (k,v) pairs."""

    def __init__(self, m, n_layers):
        super().__init__()
        self.m = m
        self.n = n_layers

    def forward(self, ids, enc):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        cache = EncoderDecoderCache(DynamicCache(), DynamicCache())
        out = self.m.model.decoder(
            input_ids=ids, encoder_hidden_states=enc,
            past_key_values=cache, use_cache=True,
        )
        logits = self.m.proj_out(out.last_hidden_state)
        sa = out.past_key_values.self_attention_cache
        ca = out.past_key_values.cross_attention_cache
        outs = [logits]
        for i in range(self.n):
            outs += [sa.layers[i].keys, sa.layers[i].values]
        for i in range(self.n):
            outs += [ca.layers[i].keys, ca.layers[i].values]
        return tuple(outs)


class _WhisperStepN(torch.nn.Module):
    """_WhisperStep generalized to n decoder layers; cross caches are
    STATIC inputs reused via is_updated."""

    def __init__(self, m, n_layers):
        super().__init__()
        self.m = m
        self.n = n_layers

    def forward(self, ids, enc, *caches):
        from transformers.cache_utils import DynamicCache, EncoderDecoderCache

        sa, ca = DynamicCache(), DynamicCache()
        for i in range(self.n):
            sa.update(caches[2 * i], caches[2 * i + 1], i)
            ca.update(caches[2 * self.n + 2 * i],
                      caches[2 * self.n + 2 * i + 1], i)
        cache = EncoderDecoderCache(sa, ca)
        out = self.m.model.decoder(
            input_ids=ids, encoder_hidden_states=enc,
            past_key_values=cache, use_cache=True,
        )
        logits = self.m.proj_out(out.last_hidden_state)
        sa = out.past_key_values.self_attention_cache
        outs = [logits]
        for i in range(self.n):
            outs += [sa.layers[i].keys, sa.layers[i].values]
        return tuple(outs)


@pytest.mark.skipif(
    not os.environ.get("BIRDNET_TEST_SLOW"),
    reason="set BIRDNET_TEST_SLOW=1 for real-width whisper-tiny decode",
)
def test_whisper_tiny_real_width_decode():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(31)
    cfg = WhisperConfig(  # whisper-tiny's published geometry
        vocab_size=51865, d_model=384, encoder_layers=4, decoder_layers=4,
        encoder_attention_heads=6, decoder_attention_heads=6,
        encoder_ffn_dim=1536, decoder_ffn_dim=1536, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=448,
        attn_implementation="eager",
        pad_token_id=50256, bos_token_id=50257, eos_token_id=50256,
        decoder_start_token_id=50257, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    m = WhisperForConditionalGeneration(cfg)
    m.eval()
    n_layers, heads = 4, 6
    head_dim = 384 // heads
    feats = torch.randn(1, 80, 3000) * 0.5
    prompt = torch.tensor([[50257, 50358, 50362]])  # sot, task-ish, no-ts
    n_steps = 3

    from transformers.cache_utils import DynamicCache, EncoderDecoderCache

    torch_logits, torch_toks = [], []
    with torch.no_grad():
        enc_t = m.model.encoder(feats).last_hidden_state
        cache = EncoderDecoderCache(DynamicCache(), DynamicCache())
        ids = prompt
        for _ in range(n_steps):
            out = m.model.decoder(
                input_ids=ids, encoder_hidden_states=enc_t,
                past_key_values=cache, use_cache=True,
            )
            cache = out.past_key_values
            logits = m.proj_out(out.last_hidden_state)
            torch_logits.append(logits[:, -1].numpy().copy())
            tok = int(logits[:, -1].argmax())
            torch_toks.append(tok)
            ids = torch.tensor([[tok]])

    enc = np.asarray(_run_engine_step(_WhisperEncoder(m), (feats,))[0])
    enc_md = float(np.abs(enc - enc_t.numpy()).max())
    np.testing.assert_allclose(enc, enc_t.numpy(), atol=5e-4, rtol=1e-3)

    outs = _run_engine_step(
        _WhisperPrefillN(m, n_layers), (prompt, torch.from_numpy(enc))
    )
    logits = np.asarray(outs[0])[:, -1]
    pre_md = float(np.abs(logits - torch_logits[0]).max())
    np.testing.assert_allclose(logits, torch_logits[0], atol=5e-3, rtol=1e-3)
    self_kv = [
        torch.from_numpy(np.asarray(o).copy())
        for o in outs[1:1 + 2 * n_layers]
    ]
    cross_kv = [
        torch.from_numpy(np.asarray(o).copy())
        for o in outs[1 + 2 * n_layers:]
    ]
    assert cross_kv[0].shape == (1, heads, 1500, head_dim)
    assert self_kv[0].shape == (1, heads, 3, head_dim)
    engine_toks = [int(logits[0].argmax())]

    step = _WhisperStepN(m, n_layers)
    enc_in = torch.from_numpy(enc)
    names = ["ids", "enc"]
    names += [f"s{c}{i}" for i in range(n_layers) for c in "kv"]
    names += [f"c{c}{i}" for i in range(n_layers) for c in "kv"]
    step_md = 0.0
    for t in range(1, n_steps):
        ids = torch.tensor([[engine_toks[-1]]])
        step_model, outs = _run_engine_step_named(
            step, (ids, enc_in, *self_kv, *cross_kv), names
        )
        if t == 1:
            assert "enc" not in step_model.input_names  # cross reuse, real
        logits = np.asarray(outs[0])[:, -1]
        step_md = max(
            step_md, float(np.abs(logits - torch_logits[t]).max())
        )
        np.testing.assert_allclose(
            logits, torch_logits[t], atol=5e-3, rtol=1e-3
        )
        new_self = [
            torch.from_numpy(np.asarray(o).copy()) for o in outs[1:]
        ]
        assert new_self[0].shape[2] == self_kv[0].shape[2] + 1
        self_kv = new_self
        engine_toks.append(int(logits[0].argmax()))

    assert engine_toks == torch_toks
    print(
        f"whisper-tiny real-width fp32 maxdiff: enc {enc_md:.3e}, "
        f"prefill logits {pre_md:.3e}, step logits {step_md:.3e}"
    )


def test_genai_combined_artifact_checkpoint_roundtrip(tmp_path):
    """The quantized merged artifact survives a .btck checkpoint
    round-trip: the reloaded model re-detects ``use_cache_branch`` as a
    dispatch input (round-4 fix, commit 6cdb7f1) and both dispatch arms
    produce outputs identical to the original import's."""
    from birdnet_tpu.checkpoint import load_checkpoint, save_checkpoint

    w = _genai_weights(seed=45)
    d = w["dims"]
    orig = import_onnx(_genai_merged(w, quantize=True))
    ck = tmp_path / "genai.btck"
    save_checkpoint(orig, ck)
    back = load_checkpoint(ck)
    assert back.dispatch_inputs == ["use_cache_branch"]
    assert back.input_names == orig.input_names

    o_fwd = make_forward(orig, precision="fp32")
    b_fwd = make_forward(back, precision="fp32")
    r = np.random.default_rng(9)
    ids = r.integers(0, d["V"], (1, 3)).astype(np.int64)
    pk = np.zeros((1, d["KVN"], 0, d["H"]), np.float32)
    args_prompt = (ids, np.array([False]), pk, pk,
                   np.array([2], np.int32), np.array([3], np.int32),
                   np.array([0], np.int64))
    o_outs = o_fwd(orig.params, *args_prompt)
    b_outs = b_fwd(back.params, *args_prompt)
    for o, b in zip(o_outs, b_outs):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(b))
    # with-past arm through the reloaded model too
    pk5 = r.standard_normal((1, d["KVN"], 5, d["H"])).astype(np.float32)
    pv5 = r.standard_normal((1, d["KVN"], 5, d["H"])).astype(np.float32)
    args_step = (np.array([[4]], np.int64), np.array([True]), pk5, pv5,
                 np.array([5], np.int32), np.array([6], np.int32),
                 np.array([5], np.int64))
    o_outs = o_fwd(orig.params, *args_step)
    b_outs = b_fwd(back.params, *args_step)
    for o, b in zip(o_outs, b_outs):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(b))


def test_genai_combined_artifact_quantized_embedding():
    """The combined artifact with the embedding table ALSO stored 4-bit
    (GatherBlockQuantized lookup) matches the float twin per step —
    all nine weight tensors quantized, the full genai storage story."""
    toks = _genai_run_loop(_genai_weights(seed=46, quant_emb=True))
    assert len(set(toks)) > 1
