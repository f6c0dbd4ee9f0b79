"""Reference ModelDesc (.bin.gz) import/export and a JAX forward that matches
the repaired reference Eigen backend bit-for-bit in float32.

The reference stores nets as gzipped text/binary streams parsed by
`cpp/neuralnet/desc.cpp` (ModelDesc parse order: desc.cpp:972-1096; layers:
ConvLayerDesc desc.cpp:110-155 [file order y,x,ic,oc], BatchNormLayerDesc
desc.cpp:177-219, MatMulLayerDesc desc.cpp:274-302 [file order ic,oc],
MatBiasLayerDesc desc.cpp:320-337, block stacks desc.cpp:562-641, TrunkDesc
desc.cpp:648-696, PolicyHeadDesc desc.cpp:752-815, ValueHeadDesc
desc.cpp:846-925]. The Coffee fork's policy head has one plane per move
direction (p2Conv out = 4; repaired desc.cpp check — see
refbuild_patches/reference_repairs.patch) and the pass head is parsed but
unused.

The forward math mirrors the Eigen backend (the only backend runnable on the
comparison host, BASELINE.md):
  * conv: SAME zero padding, cross-correlation (eigenbackend.cpp ConvLayer)
  * batchnorm folds to x*mergedScale+mergedBias, then activation, then hard
    zeroing outside the board mask (eigenbackend.cpp:684-733)
  * gpool concat = [mean, mean*(sqrt(maskSum)-14)*0.1, max-over-board]
    (poolRowsGPool, eigenbackend.cpp:141-167; max uses x + (mask-1) so
    off-board never wins)
  * value pool = [mean, mean*s, mean*(s*s*0.01c... )] exactly
    poolRowsValueHead (eigenbackend.cpp:168-186)
  * residual blocks are pre-activation with the final conv accumulated into
    the trunk (eigenbackend.cpp ResidualBlock/GlobalPoolingResidualBlock)
  * heads per PolicyHead::apply / ValueHead::apply
    (eigenbackend.cpp:1265-1379); policy logits are returned dir-major
    [dir*(Y*X) + y*X + x] matching our flat policy layout (the repaired
    getOutput writes policyProbs + d*XY the same way)

Post-processing (`make_ref_eval_fn`) matches the fork's NNEvaluator
(nneval.cpp:765-812): value is a TWO-way softmax over the win/loss logits —
the third (draw) channel of the value head exists in the file format but the
fork's NNOutput dropped it, so the engine never sees a draw probability —
and shorttermWinlossError = softplus(x*0.5)*sqrt(shorttermValueErrorMult),
varTimeLeft = softplus(x)*varianceTimeMult (defaults 0.25 / 40.0 for file
versions < 13, desc.cpp:938-947,1012-1051).

This is a deliberate plain-functional design (params pytree + pure forward)
rather than a flax transcription: imported weights are frozen inference
artifacts, the block structure is data (parsed from the file), and a single
jitted function keeps XLA free to fuse the whole net; flax module machinery
would add indirection with no training use-case. Export (`save_ref_model`)
round-trips a parsed/edited model back to .bin.gz so a net finetuned here in
the reference architecture can be handed back to the reference engine.
"""

from __future__ import annotations

import dataclasses
import gzip
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from katacoffee_tpu.game.board import GameConfig, NUM_DIRECTIONS

ACT_IDENTITY = 0
ACT_RELU = 1
ACT_MISH = 2

_ACT_NAMES = {
    "ACTIVATION_IDENTITY": ACT_IDENTITY,
    "ACTIVATION_RELU": ACT_RELU,
    "ACTIVATION_MISH": ACT_MISH,
}
_ACT_TOKENS = {v: k for k, v in _ACT_NAMES.items()}

ORDINARY_BLOCK = "ordinary_block"
GPOOL_BLOCK = "gpool_block"
NESTED_BLOCK = "nested_bottleneck_block"

# ModelPostProcessParams defaults (desc.cpp:938-947) for file version < 13
DEFAULT_POSTPROCESS = {
    "tdScoreMultiplier": 20.0,
    "scoreMeanMultiplier": 20.0,
    "scoreStdevMultiplier": 20.0,
    "leadMultiplier": 20.0,
    "varianceTimeMultiplier": 40.0,
    "shorttermValueErrorMultiplier": 0.25,
    "shorttermScoreErrorMultiplier": 30.0,
}


class _Reader:
    """Token/binary reader replicating desc.cpp's istream usage: `in >> tok`
    skips whitespace; binary float blocks are '@BIN@' + n*4 little-endian
    bytes (readFloats, desc.cpp:37-92). Plain-text float models (.txt.gz)
    read floats as whitespace tokens instead."""

    def __init__(self, data: bytes, binary_floats: bool):
        self.data = data
        self.pos = 0
        self.binary_floats = binary_floats

    def token(self) -> str:
        d, n = self.data, len(self.data)
        i = self.pos
        while i < n and d[i : i + 1].isspace():
            i += 1
        if i >= n:
            raise ValueError("unexpected end of model file")
        j = i
        while j < n and not d[j : j + 1].isspace():
            j += 1
        self.pos = j
        return d[i:j].decode()

    def int(self) -> int:
        return int(self.token())

    def float(self) -> float:
        return float(self.token())

    def floats(self, n: int) -> np.ndarray:
        if not self.binary_floats:
            return np.array([self.float() for _ in range(n)], np.float32)
        d = self.data
        i = self.pos
        skipped = 0
        while d[i : i + 1] != b"@":
            i += 1
            skipped += 1
            if skipped > 100 or i >= len(d):
                raise ValueError("binary float block header not found")
        if d[i : i + 5] != b"@BIN@":
            raise ValueError("bad binary float block header")
        i += 5
        arr = np.frombuffer(d, dtype="<f4", count=n, offset=i).astype(np.float32)
        self.pos = i + 4 * n
        if not np.isfinite(arr).all():
            raise ValueError("non-finite weight in model file")
        return arr


def _parse_conv(r: _Reader) -> dict:
    name = r.token()
    ky, kx, ic, oc = r.int(), r.int(), r.int(), r.int()
    dy, dx = r.int(), r.int()
    if dy != 1 or dx != 1:
        raise ValueError(f"{name}: dilation unsupported")
    w = r.floats(ky * kx * ic * oc).reshape(ky, kx, ic, oc)  # HWIO directly
    return {"name": name, "w": w}


def _parse_bn(r: _Reader, act: int | None = None) -> dict:
    name = r.token()
    c = r.int()
    eps = r.float()
    has_scale, has_bias = r.int(), r.int()
    mean = r.floats(c)
    var = r.floats(c)
    scale = r.floats(c) if has_scale else np.ones(c, np.float32)
    bias = r.floats(c) if has_bias else np.zeros(c, np.float32)
    # Fold like eigenbackend.cpp:705-710 so the forward is a single FMA
    mscale = scale / np.sqrt(var + eps)
    mbias = bias - mscale * mean
    return {
        "name": name,
        "mean": mean,
        "var": var,
        "scale_raw": scale,
        "bias_raw": bias,
        "eps": eps,
        "has_scale": has_scale,
        "has_bias": has_bias,
        "scale": mscale.astype(np.float32),
        "bias": mbias.astype(np.float32),
    }


def _parse_act(r: _Reader, version: int) -> int:
    r.token()  # name
    if version >= 11:
        return _ACT_NAMES[r.token()]
    return ACT_RELU


def _parse_matmul(r: _Reader) -> dict:
    name = r.token()
    ic, oc = r.int(), r.int()
    w = r.floats(ic * oc).reshape(ic, oc)
    return {"name": name, "w": w}


def _parse_matbias(r: _Reader) -> dict:
    name = r.token()
    c = r.int()
    return {"name": name, "b": r.floats(c)}


def _parse_block_stack(r: _Reader, version: int, num_blocks: int) -> list:
    blocks = []
    for _ in range(num_blocks):
        kind = r.token()
        if kind == ORDINARY_BLOCK:
            b = {"kind": kind, "name": r.token()}
            b["preBN"] = _parse_bn(r)
            b["preAct"] = _parse_act(r, version)
            b["regularConv"] = _parse_conv(r)
            b["midBN"] = _parse_bn(r)
            b["midAct"] = _parse_act(r, version)
            b["finalConv"] = _parse_conv(r)
        elif kind == GPOOL_BLOCK:
            b = {"kind": kind, "name": r.token()}
            b["preBN"] = _parse_bn(r)
            b["preAct"] = _parse_act(r, version)
            b["regularConv"] = _parse_conv(r)
            b["gpoolConv"] = _parse_conv(r)
            b["gpoolBN"] = _parse_bn(r)
            b["gpoolAct"] = _parse_act(r, version)
            b["gpoolToBiasMul"] = _parse_matmul(r)
            b["midBN"] = _parse_bn(r)
            b["midAct"] = _parse_act(r, version)
            b["finalConv"] = _parse_conv(r)
        elif kind == NESTED_BLOCK:
            b = {"kind": kind, "name": r.token()}
            n = r.int()
            b["numBlocks"] = n
            b["preBN"] = _parse_bn(r)
            b["preAct"] = _parse_act(r, version)
            b["preConv"] = _parse_conv(r)
            b["blocks"] = _parse_block_stack(r, version, n)
            b["postBN"] = _parse_bn(r)
            b["postAct"] = _parse_act(r, version)
            b["postConv"] = _parse_conv(r)
        else:
            raise ValueError(f"unknown block kind {kind!r}")
        blocks.append(b)
    return blocks


@dataclasses.dataclass
class RefModel:
    """A parsed reference net: structural metadata + numpy weight pytree.
    `forward(model)` builds the jittable float32 forward."""

    name: str
    version: int  # file/arch version (desc.cpp); Coffee writes 9
    num_input_channels: int
    num_input_global_channels: int
    post_process: dict
    trunk: dict
    policy_head: dict
    value_head: dict

    @property
    def policy_channels(self) -> int:
        return int(self.policy_head["p2Conv"]["w"].shape[-1])


def parse_ref_model(data: bytes, binary_floats: bool = True) -> RefModel:
    r = _Reader(data, binary_floats)
    name = r.token()
    version = r.int()
    if version < 3:
        raise ValueError(f"model file version {version} too old")
    in_c = r.int()
    in_g = r.int()
    pp = dict(DEFAULT_POSTPROCESS)
    if version >= 13:
        for key in (
            "tdScoreMultiplier",
            "scoreMeanMultiplier",
            "scoreStdevMultiplier",
            "leadMultiplier",
            "varianceTimeMultiplier",
            "shorttermValueErrorMultiplier",
            "shorttermScoreErrorMultiplier",
        ):
            pp[key] = r.float()

    trunk: dict = {"name": r.token()}
    trunk["numBlocks"] = r.int()
    trunk["trunkNumChannels"] = r.int()
    trunk["midNumChannels"] = r.int()
    trunk["regularNumChannels"] = r.int()
    trunk["dilatedNumChannels"] = r.int()  # parsed, unused (desc.cpp:655)
    trunk["gpoolNumChannels"] = r.int()
    trunk["initialConv"] = _parse_conv(r)
    trunk["initialMatMul"] = _parse_matmul(r)
    trunk["blocks"] = _parse_block_stack(r, version, trunk["numBlocks"])
    trunk["tipBN"] = _parse_bn(r)
    trunk["tipAct"] = _parse_act(r, version)

    ph: dict = {"name": r.token()}
    ph["p1Conv"] = _parse_conv(r)
    ph["g1Conv"] = _parse_conv(r)
    ph["g1BN"] = _parse_bn(r)
    ph["g1Act"] = _parse_act(r, version)
    ph["gpoolToBiasMul"] = _parse_matmul(r)
    ph["p1BN"] = _parse_bn(r)
    ph["p1Act"] = _parse_act(r, version)
    ph["p2Conv"] = _parse_conv(r)
    ph["gpoolToPassMul"] = _parse_matmul(r)
    n_pol = ph["p2Conv"]["w"].shape[-1]
    expect = 2 * NUM_DIRECTIONS if version >= 12 else NUM_DIRECTIONS
    if n_pol != expect:
        raise ValueError(
            f"p2Conv out channels {n_pol} != {expect} (Coffee dir-planes, "
            "repaired desc.cpp check)"
        )

    vh: dict = {"name": r.token()}
    vh["v1Conv"] = _parse_conv(r)
    vh["v1BN"] = _parse_bn(r)
    vh["v1Act"] = _parse_act(r, version)
    vh["v2Mul"] = _parse_matmul(r)
    vh["v2Bias"] = _parse_matbias(r)
    vh["v2Act"] = _parse_act(r, version)
    vh["v3Mul"] = _parse_matmul(r)
    vh["v3Bias"] = _parse_matbias(r)
    vh["sv3Mul"] = _parse_matmul(r)
    vh["sv3Bias"] = _parse_matbias(r)
    vh["vOwnershipConv"] = _parse_conv(r)

    return RefModel(
        name=name,
        version=version,
        num_input_channels=in_c,
        num_input_global_channels=in_g,
        post_process=pp,
        trunk=trunk,
        policy_head=ph,
        value_head=vh,
    )


def load_ref_model(path: str) -> RefModel:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    binary = ".bin." in path or path.endswith(".bin") or b"@BIN@" in data[:200000]
    return parse_ref_model(data, binary_floats=binary)


# ---------------------------------------------------------------------------
# Export (.bin.gz writer) — inverse of the parse above
# ---------------------------------------------------------------------------


def _emit_conv(out: list, c: dict):
    w = np.asarray(c["w"], "<f4")
    ky, kx, ic, oc = w.shape
    out.append(f"{c['name']}\n{ky}\n{kx}\n{ic}\n{oc}\n1\n1\n".encode())
    out.append(b"@BIN@" + w.tobytes() + b"\n")


def _emit_bn(out: list, b: dict):
    c = len(b["mean"])
    out.append(
        f"{b['name']}\n{c}\n{b['eps']}\n{int(b['has_scale'])}\n"
        f"{int(b['has_bias'])}\n".encode()
    )
    for key in ("mean", "var"):
        out.append(b"@BIN@" + np.asarray(b[key], "<f4").tobytes() + b"\n")
    if b["has_scale"]:
        out.append(b"@BIN@" + np.asarray(b["scale_raw"], "<f4").tobytes() + b"\n")
    if b["has_bias"]:
        out.append(b"@BIN@" + np.asarray(b["bias_raw"], "<f4").tobytes() + b"\n")


def _emit_act(out: list, version: int, act: int, name: str):
    if version >= 11:
        out.append(f"{name}\n{_ACT_TOKENS[act]}\n".encode())
    else:
        out.append(f"{name}\n".encode())


def _emit_matmul(out: list, m: dict):
    w = np.asarray(m["w"], "<f4")
    ic, oc = w.shape
    out.append(f"{m['name']}\n{ic}\n{oc}\n".encode())
    out.append(b"@BIN@" + w.tobytes() + b"\n")


def _emit_matbias(out: list, m: dict):
    b = np.asarray(m["b"], "<f4")
    out.append(f"{m['name']}\n{len(b)}\n".encode())
    out.append(b"@BIN@" + b.tobytes() + b"\n")


def _emit_blocks(out: list, version: int, blocks: list):
    for b in blocks:
        out.append(f"{b['kind']}\n{b['name']}\n".encode())
        if b["kind"] == ORDINARY_BLOCK:
            _emit_bn(out, b["preBN"])
            _emit_act(out, version, b["preAct"], b["name"] + ".preAct")
            _emit_conv(out, b["regularConv"])
            _emit_bn(out, b["midBN"])
            _emit_act(out, version, b["midAct"], b["name"] + ".midAct")
            _emit_conv(out, b["finalConv"])
        elif b["kind"] == GPOOL_BLOCK:
            _emit_bn(out, b["preBN"])
            _emit_act(out, version, b["preAct"], b["name"] + ".preAct")
            _emit_conv(out, b["regularConv"])
            _emit_conv(out, b["gpoolConv"])
            _emit_bn(out, b["gpoolBN"])
            _emit_act(out, version, b["gpoolAct"], b["name"] + ".gpoolAct")
            _emit_matmul(out, b["gpoolToBiasMul"])
            _emit_bn(out, b["midBN"])
            _emit_act(out, version, b["midAct"], b["name"] + ".midAct")
            _emit_conv(out, b["finalConv"])
        else:
            out.append(f"{b['numBlocks']}\n".encode())
            _emit_bn(out, b["preBN"])
            _emit_act(out, version, b["preAct"], b["name"] + ".preAct")
            _emit_conv(out, b["preConv"])
            _emit_blocks(out, version, b["blocks"])
            _emit_bn(out, b["postBN"])
            _emit_act(out, version, b["postAct"], b["name"] + ".postAct")
            _emit_conv(out, b["postConv"])


def save_ref_model(model: RefModel, path: str):
    """Write back to the reference's .bin.gz format (desc.cpp parse order)."""
    out: list = []
    out.append(f"{model.name}\n{model.version}\n".encode())
    out.append(
        f"{model.num_input_channels}\n{model.num_input_global_channels}\n".encode()
    )
    if model.version >= 13:
        for key in (
            "tdScoreMultiplier",
            "scoreMeanMultiplier",
            "scoreStdevMultiplier",
            "leadMultiplier",
            "varianceTimeMultiplier",
            "shorttermValueErrorMultiplier",
            "shorttermScoreErrorMultiplier",
        ):
            out.append(f"{model.post_process[key]}\n".encode())
    t = model.trunk
    out.append(
        f"{t['name']}\n{t['numBlocks']}\n{t['trunkNumChannels']}\n"
        f"{t['midNumChannels']}\n{t['regularNumChannels']}\n"
        f"{t['dilatedNumChannels']}\n{t['gpoolNumChannels']}\n".encode()
    )
    _emit_conv(out, t["initialConv"])
    _emit_matmul(out, t["initialMatMul"])
    _emit_blocks(out, model.version, t["blocks"])
    _emit_bn(out, t["tipBN"])
    _emit_act(out, model.version, t["tipAct"], t["name"] + ".tipAct")

    ph = model.policy_head
    out.append(f"{ph['name']}\n".encode())
    _emit_conv(out, ph["p1Conv"])
    _emit_conv(out, ph["g1Conv"])
    _emit_bn(out, ph["g1BN"])
    _emit_act(out, model.version, ph["g1Act"], "g1Act")
    _emit_matmul(out, ph["gpoolToBiasMul"])
    _emit_bn(out, ph["p1BN"])
    _emit_act(out, model.version, ph["p1Act"], "p1Act")
    _emit_conv(out, ph["p2Conv"])
    _emit_matmul(out, ph["gpoolToPassMul"])

    vh = model.value_head
    out.append(f"{vh['name']}\n".encode())
    _emit_conv(out, vh["v1Conv"])
    _emit_bn(out, vh["v1BN"])
    _emit_act(out, model.version, vh["v1Act"], "v1Act")
    _emit_matmul(out, vh["v2Mul"])
    _emit_matbias(out, vh["v2Bias"])
    _emit_act(out, model.version, vh["v2Act"], "v2Act")
    _emit_matmul(out, vh["v3Mul"])
    _emit_matbias(out, vh["v3Bias"])
    _emit_matmul(out, vh["sv3Mul"])
    _emit_matbias(out, vh["sv3Bias"])
    _emit_conv(out, vh["vOwnershipConv"])

    data = b"".join(out)
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wb") as f:
        f.write(data)


# ---------------------------------------------------------------------------
# Forward (float32, Eigen-parity)
# ---------------------------------------------------------------------------


def _act(x, kind: int):
    if kind == ACT_IDENTITY:
        return x
    if kind == ACT_RELU:
        return jax.nn.relu(x)
    # ACTIVATION_MISH as the Eigen backend computes it (eigenbackend.cpp:729):
    # x * tanh(log1p(exp(min(x,20))) + max(x,20) - 20)
    return x * jnp.tanh(
        jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))) + jnp.maximum(x, 20.0) - 20.0
    )


def _bn_act(x, bn: dict, act: int, mask):
    """Folded batchnorm + activation + hard mask (eigenbackend.cpp:714-733).
    x [B,H,W,C], mask [B,H,W,1]."""
    y = _act(x * bn["scale"] + bn["bias"], act)
    return y * mask


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _gpool(x, mask, mask_sum):
    """poolRowsGPool (eigenbackend.cpp:141-167): [B,H,W,C] -> [B,3C]
    = concat(mean, mean*(sqrt(n)-14)*0.1, masked max)."""
    s = x.sum(axis=(1, 2))
    mean = s / mask_sum[:, None]
    sqrtdiv = jnp.sqrt(mask_sum)[:, None]
    # eigenbackend.cpp poolRowsGPool inits the max accumulator at -1.0, so
    # the pooled max is floored there even if every on-board cell is below.
    mx = jnp.maximum((x + (mask - 1.0)).max(axis=(1, 2)), -1.0)
    return jnp.concatenate([mean, mean * (sqrtdiv - 14.0) * 0.1, mx], axis=-1)


def _vpool(x, mask_sum):
    """poolRowsValueHead (eigenbackend.cpp:168-186)."""
    mean = x.sum(axis=(1, 2)) / mask_sum[:, None]
    s = (jnp.sqrt(mask_sum)[:, None] - 14.0) * 0.1
    return jnp.concatenate([mean, mean * s, mean * (s * s - 0.1)], axis=-1)


def _apply_blocks(trunk, blocks: list, mask, mask_sum):
    for b in blocks:
        if b["kind"] == ORDINARY_BLOCK:
            h = _bn_act(trunk, b["preBN"], b["preAct"], mask)
            h = _conv(h, b["regularConv"]["w"])
            h = _bn_act(h, b["midBN"], b["midAct"], mask)
            trunk = trunk + _conv(h, b["finalConv"]["w"])
        elif b["kind"] == GPOOL_BLOCK:
            h = _bn_act(trunk, b["preBN"], b["preAct"], mask)
            reg = _conv(h, b["regularConv"]["w"])
            gp = _conv(h, b["gpoolConv"]["w"])
            gp = _bn_act(gp, b["gpoolBN"], b["gpoolAct"], mask)
            pooled = _gpool(gp, mask, mask_sum)
            bias = pooled @ b["gpoolToBiasMul"]["w"]
            reg = reg + bias[:, None, None, :]
            reg = _bn_act(reg, b["midBN"], b["midAct"], mask)
            trunk = trunk + _conv(reg, b["finalConv"]["w"])
        else:  # nested bottleneck
            h = _bn_act(trunk, b["preBN"], b["preAct"], mask)
            h = _conv(h, b["preConv"]["w"])
            h = _apply_blocks(h, b["blocks"], mask, mask_sum)
            h = _bn_act(h, b["postBN"], b["postAct"], mask)
            trunk = trunk + _conv(h, b["postConv"]["w"])
    return trunk


def ref_forward(model: RefModel, spatial_nchw, glob):
    """Full forward. spatial_nchw [B, C, Y, X] (extract_features layout),
    glob [B, G]. Returns a dict of RAW head outputs (logits), pre-
    postprocessing, in float32:
      policy_logits [B, 4*Y*X] dir-major, value_logits [B,3] (win, loss,
      draw — draw unused by the reference engine), sv [B,6], ownership
      [B,Y,X], policy_pass [B,1-2] (parsed, unused in Coffee).
    Under version >= 12 policy channels double (plain, optimistic) and
    optimistic_policy_logits is also returned."""
    x = jnp.transpose(spatial_nchw, (0, 2, 3, 1)).astype(jnp.float32)
    glob = glob.astype(jnp.float32)
    mask = x[..., :1]  # input channel 0 = on-board (nninputs fillRowV1)
    mask_sum = mask.sum(axis=(1, 2, 3))

    t = model.trunk
    trunk = _conv(x, t["initialConv"]["w"])
    trunk = trunk + (glob @ t["initialMatMul"]["w"])[:, None, None, :]
    trunk = _apply_blocks(trunk, t["blocks"], mask, mask_sum)
    trunk = _bn_act(trunk, t["tipBN"], t["tipAct"], mask)

    ph = model.policy_head
    p1 = _conv(trunk, ph["p1Conv"]["w"])
    g1 = _conv(trunk, ph["g1Conv"]["w"])
    g1 = _bn_act(g1, ph["g1BN"], ph["g1Act"], mask)
    g1pool = _gpool(g1, mask, mask_sum)
    p1 = p1 + (g1pool @ ph["gpoolToBiasMul"]["w"])[:, None, None, :]
    p1 = _bn_act(p1, ph["p1BN"], ph["p1Act"], mask)
    pol = _conv(p1, ph["p2Conv"]["w"])  # [B,Y,X,4] (or 8 for v12+)
    policy_pass = g1pool @ ph["gpoolToPassMul"]["w"]

    B, Y, X, _ = pol.shape
    if model.version >= 12:
        plain = pol[..., 0::2]
        opt = pol[..., 1::2]
        policy_logits = jnp.transpose(plain, (0, 3, 1, 2)).reshape(B, -1)
        opt_logits = jnp.transpose(opt, (0, 3, 1, 2)).reshape(B, -1)
    else:
        policy_logits = jnp.transpose(pol, (0, 3, 1, 2)).reshape(B, -1)
        opt_logits = None

    vh = model.value_head
    v1 = _conv(trunk, vh["v1Conv"]["w"])
    v1 = _bn_act(v1, vh["v1BN"], vh["v1Act"], mask)
    v2 = _vpool(v1, mask_sum) @ vh["v2Mul"]["w"] + vh["v2Bias"]["b"]
    v2 = _act(v2, vh["v2Act"])
    value_logits = v2 @ vh["v3Mul"]["w"] + vh["v3Bias"]["b"]
    sv = v2 @ vh["sv3Mul"]["w"] + vh["sv3Bias"]["b"]
    ownership = _conv(v1, vh["vOwnershipConv"]["w"])[..., 0]

    out = {
        "policy_logits": policy_logits,
        "value_logits": value_logits,
        "sv": sv,
        "ownership": ownership,
        "policy_pass": policy_pass,
    }
    if opt_logits is not None:
        out["optimistic_policy_logits"] = opt_logits
    return out


def ref_compat_line_features(cfg: GameConfig, board: jax.Array) -> jax.Array:
    """The reference's exact-run feature channels with its ACTUAL semantics
    (repaired Board::fillRowWithLine, board.cpp:392-420), which differ from
    our intent-semantics channels 15-17 (docs/DESIGN.md decision 5) in two
    ways an imported reference-trained net depends on:

      * FOREACHADJ only iterates N/W/E/S offsets (board.cpp:71-81), so only
        HORIZONTAL and VERTICAL runs are ever scanned — diagonal runs are
        invisible to this feature even though they win games;
      * a per-board `visited` set, shared across directions, suppresses
        scans: when a stone initiates (first unvisited stone in y-major
        scan order), its entire h-run AND v-run are marked visited, so any
        stone of those runs never initiates its own scans — under-reporting
        crossing runs.

    Returns [3, Y, X] float32 for exact lengths win_len-1, win_len-2,
    win_len-3 — drop-in replacement for extract_features channels 15-17
    when feeding an imported reference net. Sequential over cells (the
    reference's algorithm is order-dependent) via lax.fori_loop of [area]
    vector ops — negligible next to the net forward."""
    Y, X = cfg.y_size, cfg.x_size
    area = cfg.area
    flat = board.reshape(-1)
    stone = flat > 0
    rows = jnp.arange(area) // X
    cols = jnp.arange(area) % X

    # Segment ids: cells in the same row/col with the same id form a maximal
    # same-value run (boundaries at any value change or row/col start).
    b2 = board
    hbound = jnp.concatenate(
        [jnp.ones((Y, 1), jnp.int32), (b2[:, 1:] != b2[:, :-1]).astype(jnp.int32)],
        axis=1,
    )
    hseg = jnp.cumsum(hbound.reshape(-1))  # row-major flat; rows share ids
    vbound = jnp.concatenate(
        [jnp.ones((1, X), jnp.int32), (b2[1:, :] != b2[:-1, :]).astype(jnp.int32)],
        axis=0,
    )
    vseg = jnp.cumsum(vbound.T.reshape(-1)).reshape(X, Y).T.reshape(-1)

    lengths = [cfg.win_len - 1, cfg.win_len - 2, cfg.win_len - 3]
    lengths_arr = jnp.asarray(lengths)

    def body(i, carry):
        visited, out = carry
        init = stone[i] & ~visited[i]
        hmask = (rows == rows[i]) & (hseg == hseg[i]) & stone
        vmask = (cols == cols[i]) & (vseg == vseg[i]) & stone
        visited = visited | (init & (hmask | vmask))
        hlen = hmask.sum()
        vlen = vmask.sum()
        hit = (init & (hlen == lengths_arr))[:, None] & hmask[None, :]
        hit = hit | ((init & (vlen == lengths_arr))[:, None] & vmask[None, :])
        return visited, out | hit

    _, out = jax.lax.fori_loop(
        0,
        area,
        body,
        (jnp.zeros((area,), bool), jnp.zeros((3, area), bool)),
    )
    return out.astype(jnp.float32).reshape(3, Y, X)


def ref_compat_features(cfg: GameConfig, state) -> tuple:
    """extract_features with channels 15-17 replaced by the reference's
    actual fillRowWithLine semantics — what an imported reference net was
    trained on / what the reference binary feeds it."""
    from katacoffee_tpu.nn.features import extract_features

    spatial, glob = extract_features(cfg, state)
    lines = ref_compat_line_features(cfg, state.board)
    return jnp.concatenate([spatial[:15], lines], axis=0), glob


def make_ref_eval_fn(cfg: GameConfig, model: RefModel, symmetry_randomize: bool = False):
    """EvalFn over the imported reference net, with the repaired reference
    engine's post-processing (nneval.cpp:765-812): policy = softmax of the
    dir-major logits over LEGAL moves; value = TWO-way softmax over win/loss
    (the fork's NNOutput has no draw/noResult field, so draw prob is 0 and
    utility = P(win)-P(loss) of the player to move); shortterm_error =
    softplus(sv4*0.5)*sqrt(shorttermValueErrorMultiplier).

    symmetry_randomize mirrors nnRandomize: a random dihedral symmetry is
    applied to the features and inverted on the policy per evaluation."""
    import functools

    from katacoffee_tpu.game.board import GameState, legal_mask_flat
    from katacoffee_tpu.search.mcts import EvalResult

    sem = math.sqrt(model.post_process["shorttermValueErrorMultiplier"])

    def fn(states: GameState, rng: jax.Array) -> EvalResult:
        spatial, glob = jax.vmap(functools.partial(ref_compat_features, cfg))(states)
        if symmetry_randomize:
            from katacoffee_tpu.game import symmetry as S

            nsym = S.num_symmetries(cfg)
            syms = jax.random.randint(rng, (spatial.shape[0],), 0, nsym)
            spatial = jax.vmap(
                lambda sym, sp: jax.lax.switch(
                    sym,
                    [lambda v, s=s: S.apply_features(s, v) for s in range(nsym)],
                    sp,
                )
            )(syms, spatial)
        out = ref_forward(model, spatial, glob)
        logits = out["policy_logits"]
        if symmetry_randomize:
            from katacoffee_tpu.game import symmetry as S

            logits = jax.vmap(
                lambda sym, pol: jax.lax.switch(
                    sym,
                    [
                        lambda p, s=s: S.apply_policy(cfg, S.invert(s), p)
                        for s in range(nsym)
                    ],
                    pol,
                )
            )(syms, logits)
        legal = jax.vmap(functools.partial(legal_mask_flat, cfg))(states)
        lg = jnp.where(legal, logits, -jnp.inf)
        policy = jnp.where(legal, jax.nn.softmax(lg, axis=-1), 0.0)
        # 2-way softmax over win/loss (nneval.cpp:779-787)
        wl2 = jax.nn.softmax(out["value_logits"][:, :2], axis=-1)
        utility = wl2[:, 0] - wl2[:, 1]
        shortterm = jax.nn.softplus(out["sv"][:, 4] * 0.5) * sem
        return EvalResult(
            policy=policy,
            utility=utility,
            wl=utility,
            draw=jnp.zeros_like(utility),
            shortterm_error=shortterm,
        )

    return fn
