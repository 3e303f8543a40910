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
    dyn = {
        "input_ids": {1: "seq"}, "position_ids": {1: "seq"},
        "attention_mask": {1: "total"},
        "past_0": {3: "past"}, "past_1": {3: "past"},
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
                if t + 1 < min_len:
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
