"""com.microsoft GreedySearch — ORT's in-graph autoregressive generation.

onnxruntime's ``convert_generation.py`` wraps an entire GPT decoder in one
node whose ``decoder`` attribute is the per-step subgraph (input_ids /
position_ids / attention_mask / past_* → logits / present_*); the
reference consumes such files whole via ort (src/classifier.rs:348-350).
These tests export that subgraph from a genuine HF GPT-2 through
libtorch's serializer, splice it into a GreedySearch model through the
wire codec, and require the op's device-resident loop (fixed max_length
cache buffers + lax.while_loop) to reproduce an independent torch greedy
loop token-for-token — including CTRL-style repetition penalty,
min_length EOS suppression, vocab masking, early stop, and padding.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from _torch_export import export_onnx_bytes  # noqa: E402
from birdnet_tpu.compiler.importer import import_onnx, make_forward  # noqa: E402
from birdnet_tpu.onnx import proto as P  # noqa: E402

MS = "com.microsoft"


def _tiny_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        n_embd=32, n_layer=2, n_head=2, n_inner=64, vocab_size=50,
        n_positions=64, attn_implementation="eager",
    )
    return GPT2LMHeadModel(cfg)


class _StepGraph(torch.nn.Module):
    """The convert_generation.py decoder-subgraph signature: int32
    input_ids / position_ids, (B, total) attention_mask, stacked
    [2,B,N,P,H] pasts; logits + stacked presents out."""

    def __init__(self, m):
        super().__init__()
        self.m = m

    def forward(self, ids, pos, mask, past_0, past_1):
        from transformers.cache_utils import DynamicCache

        cache = DynamicCache()
        cache.update(past_0[0], past_0[1], 0)
        cache.update(past_1[0], past_1[1], 1)
        out = self.m(
            input_ids=ids.long(), position_ids=pos.long(),
            attention_mask=mask.long(), past_key_values=cache,
            use_cache=True,
        )
        pres = out.past_key_values
        return (
            out.logits,
            torch.stack([pres.layers[0].keys, pres.layers[0].values]),
            torch.stack([pres.layers[1].keys, pres.layers[1].values]),
        )


def _export_step_graph(m, b_sz=2):
    ids = torch.randint(0, 50, (b_sz, 1), dtype=torch.int32)
    pos = torch.full((b_sz, 1), 5, dtype=torch.int32)
    mask = torch.ones(b_sz, 6, dtype=torch.int32)
    pasts = [torch.randn(2, b_sz, 2, 5, 16) for _ in range(2)]
    names = ["input_ids", "position_ids", "attention_mask",
             "past_0", "past_1"]
    dyn = {  # batch-polymorphic, like real convert_generation exports:
        # BeamSearch runs the same subgraph at batch*num_beams rows
        "input_ids": {0: "batch", 1: "seq"},
        "position_ids": {0: "batch", 1: "seq"},
        "attention_mask": {0: "batch", 1: "total"},
        "past_0": {1: "batch", 3: "past"},
        "past_1": {1: "batch", 3: "past"},
    }
    data = export_onnx_bytes(
        _StepGraph(m), (ids, pos, mask, *pasts), opset_version=17,
        input_names=names, output_names=["logits", "present_0", "present_1"],
        dynamic_axes=dyn,
    )
    return P.decode_model(data).graph


def _greedy_model(decoder_graph, *, eos, pad, with_vocab_mask=False):
    inputs = ["input_ids", "max_length", "min_length", "repetition_penalty"]
    if with_vocab_mask:
        inputs.append("vocab_mask")
    node = P.make_node(
        "GreedySearch", inputs, ["sequences"], domain=MS,
        decoder=decoder_graph, eos_token_id=eos, pad_token_id=pad,
        model_type=0,
    )
    I32, I64, F = P.DataType.INT32, P.DataType.INT64, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [2, "seq"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
    ]
    if with_vocab_mask:
        vis.append(P.make_value_info("vocab_mask", I32, [50]))
    graph = P.GraphProto(
        name="gpt2_greedy", node=[node], input=vis,
        output=[P.make_value_info("sequences", I32, [2, "max_length"])],
    )
    return P.ModelProto(
        ir_version=8, producer_name="convert_generation-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )


def _torch_greedy(m, prompt, *, max_len, min_len, rep_pen, eos, pad,
                  vocab_mask=None):
    """Independent greedy reference with a TRUE growing cache."""
    from transformers.cache_utils import DynamicCache

    b_sz, s0 = prompt.shape
    out = np.full((b_sz, max_len), pad, np.int32)
    out[:, :s0] = prompt.numpy()
    seen = [set(prompt[b].tolist()) for b in range(b_sz)]
    done = [False] * b_sz
    cache = DynamicCache()
    cur = prompt
    with torch.no_grad():
        for t in range(s0, max_len):
            o = m(input_ids=cur.long(), past_key_values=cache,
                  use_cache=True)
            cache = o.past_key_values
            logits = o.logits[:, -1].double().numpy()
            if vocab_mask is not None:
                logits = np.where(vocab_mask.astype(bool), logits, -np.inf)
            nxt = []
            for b in range(b_sz):
                lb = logits[b].copy()
                for tok in seen[b]:
                    lb[tok] = lb[tok] / rep_pen if lb[tok] > 0 \
                        else lb[tok] * rep_pen
                if t < min_len:  # HF cur_len convention
                    lb[eos] = -np.inf
                tok = int(lb.argmax())
                if done[b]:
                    tok = pad
                else:
                    if tok == eos:
                        done[b] = True
                    out[b, t] = tok
                    seen[b].add(tok)
                nxt.append(tok)
            if all(done):
                break
            cur = torch.tensor(nxt, dtype=torch.long)[:, None]
    return out


def test_greedy_search_matches_torch_loop():
    torch.manual_seed(60)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 4), dtype=torch.int32)
    max_len, rep_pen = 10, 1.3

    # pick EOS = the token the free-running reference emits at step 2 for
    # row 0, so the engine must early-stop that row and pad behind it
    free = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=rep_pen, eos=-1, pad=-1)
    eos = int(free[0, 6])
    pad = 49
    want = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=rep_pen, eos=eos, pad=pad)
    assert (want[0] == pad).any()  # early stop actually happened

    model = import_onnx(_greedy_model(
        _export_step_graph(m), eos=eos, pad=pad
    ))
    fwd = make_forward(model, precision="fp32")
    (seq,) = fwd(
        model.params, np.asarray(prompt), np.array([max_len], np.int32),
        np.array([1], np.int32), np.array([rep_pen], np.float32),
    )
    np.testing.assert_array_equal(np.asarray(seq), want)


def test_greedy_search_min_length_and_vocab_mask():
    torch.manual_seed(61)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len, rep_pen = 9, 1.0

    free = _torch_greedy(m, prompt, max_len=max_len, min_len=1,
                         rep_pen=rep_pen, eos=-1, pad=-1)
    eos = int(free[1, 4])  # row 1 would emit this early...
    pad = 0
    min_len = 8  # ...but min_length suppresses EOS until length 8
    vocab_mask = np.ones(50, np.int32)
    vocab_mask[int(free[0, 3])] = 0  # ban row 0's would-be first token

    want = _torch_greedy(m, prompt, max_len=max_len, min_len=min_len,
                         rep_pen=rep_pen, eos=eos, pad=pad,
                         vocab_mask=vocab_mask)

    model = import_onnx(_greedy_model(
        _export_step_graph(m), eos=eos, pad=pad, with_vocab_mask=True
    ))
    fwd = make_forward(model, precision="fp32")
    (seq,) = fwd(
        model.params, np.asarray(prompt), np.array([max_len], np.int32),
        np.array([min_len], np.int32), np.array([rep_pen], np.float32),
        vocab_mask,
    )
    np.testing.assert_array_equal(np.asarray(seq), want)


# ---------------------------------------------------------------------------
# com.microsoft BeamSearch — the default node convert_generation.py emits.
# Oracle: HF generate() itself (the static-shape beam search the op
# ports), token-for-token AND score parity.
# ---------------------------------------------------------------------------


def _beam_model(decoder_graph, *, eos, pad, early_stopping=0, b_sz=2,
                n_scores=True):
    inputs = ["input_ids", "max_length", "min_length", "num_beams",
              "num_return_sequences", "length_penalty",
              "repetition_penalty"]
    outputs = ["sequences"] + (["sequences_scores"] if n_scores else [])
    node = P.make_node(
        "BeamSearch", inputs, outputs, domain=MS,
        decoder=decoder_graph, eos_token_id=eos, pad_token_id=pad,
        model_type=0, early_stopping=early_stopping,
    )
    I32, F = P.DataType.INT32, P.DataType.FLOAT
    vis = [
        P.make_value_info("input_ids", I32, [b_sz, "seq"]),
        P.make_value_info("max_length", I32, [1]),
        P.make_value_info("min_length", I32, [1]),
        P.make_value_info("num_beams", I32, [1]),
        P.make_value_info("num_return_sequences", I32, [1]),
        P.make_value_info("length_penalty", F, [1]),
        P.make_value_info("repetition_penalty", F, [1]),
    ]
    out_vis = [P.make_value_info("sequences", I32, [b_sz, "ret", "len"])]
    if n_scores:
        out_vis.append(P.make_value_info("sequences_scores", F, [b_sz, "ret"]))
    graph = P.GraphProto(
        name="gpt2_beam", node=[node], input=vis, output=out_vis,
    )
    return P.ModelProto(
        ir_version=8, producer_name="convert_generation-like", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=17),
                      P.OperatorSetId(domain=MS, version=1)],
    )


def _hf_beam(m, prompt, *, max_len, num_beams, num_return, length_penalty,
             repetition_penalty, eos, pad, early_stopping, min_len=0):
    kw = dict(
        max_length=max_len, num_beams=num_beams,
        num_return_sequences=num_return, do_sample=False,
        length_penalty=length_penalty, early_stopping=early_stopping,
        pad_token_id=pad, return_dict_in_generate=True, output_scores=True,
    )
    if repetition_penalty != 1.0:
        kw["repetition_penalty"] = repetition_penalty
    if min_len:
        kw["min_length"] = min_len
    kw["eos_token_id"] = eos if eos >= 0 else None
    with torch.no_grad():
        # explicit all-ones mask: generate() would otherwise infer one
        # from pad_token_id hits inside the (random) prompt
        out = m.generate(
            prompt.long(),
            attention_mask=torch.ones_like(prompt, dtype=torch.long),
            **kw,
        )
    b_sz = prompt.shape[0]
    seqs = np.full((b_sz * num_return, max_len), pad, np.int32)
    got = out.sequences.numpy()
    seqs[:, :got.shape[1]] = got
    return (
        seqs.reshape(b_sz, num_return, max_len),
        out.sequences_scores.numpy().reshape(b_sz, num_return),
    )


def _run_beam(model_proto, prompt, *, max_len, num_beams, num_return,
              length_penalty, repetition_penalty, min_len=1):
    model = import_onnx(model_proto)
    fwd = make_forward(model, precision="fp32")
    return fwd(
        model.params, np.asarray(prompt),
        np.array([max_len], np.int32), np.array([min_len], np.int32),
        np.array([num_beams], np.int32), np.array([num_return], np.int32),
        np.array([length_penalty], np.float32),
        np.array([repetition_penalty], np.float32),
    )


def test_beam_search_matches_hf_generate():
    """No EOS (pure length-bounded beams): sequences and length-penalized
    scores match HF generate exactly."""
    torch.manual_seed(62)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 3), dtype=torch.int32)
    max_len, k, r, lp, rp = 9, 3, 2, 1.0, 1.0

    want_seq, want_scores = _hf_beam(
        m, prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp, eos=-1, pad=49,
        early_stopping=False,
    )
    seq, scores = _run_beam(
        _beam_model(_export_step_graph(m), eos=51, pad=49),
        prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp,
    )
    np.testing.assert_array_equal(np.asarray(seq), want_seq)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)


def test_beam_search_eos_early_stopping_and_penalties():
    """EOS absorption + early_stopping=True + length/repetition penalties:
    token-for-token vs HF generate."""
    torch.manual_seed(63)
    m = _tiny_gpt2()
    m.eval()
    prompt = torch.randint(0, 50, (2, 4), dtype=torch.int32)
    max_len, k, r, lp, rp = 12, 4, 3, 2.0, 1.2

    # EOS chosen (from a free-run sweep) so several beams genuinely
    # absorb it under these penalties — exercising hypothesis storage,
    # the early-stop heuristic, and the finished-beam merge
    eos = 26
    pad = 49
    want_seq, want_scores = _hf_beam(
        m, prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp, eos=eos, pad=pad,
        early_stopping=True,
    )
    assert (want_seq == eos).any()  # absorption actually happened

    seq, scores = _run_beam(
        _beam_model(_export_step_graph(m), eos=eos, pad=pad,
                    early_stopping=1),
        prompt, max_len=max_len, num_beams=k, num_return=r,
        length_penalty=lp, repetition_penalty=rp,
    )
    np.testing.assert_array_equal(np.asarray(seq), want_seq)
    np.testing.assert_allclose(np.asarray(scores), want_scores, atol=2e-4)
