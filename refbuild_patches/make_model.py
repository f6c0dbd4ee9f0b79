#!/usr/bin/env python3
"""Generate a random-weight b6c96 Coffee model in the reference's .bin.gz
ModelDesc format (KataGo v1.13.2 desc.cpp parse order, arch version 9, Coffee
channels: 18 spatial + 1 global inputs, 4-direction policy, 3-way value,
6-channel scorevalue (ignored), 1-channel ownership).

Architecture mirrors reference python/modelconfigs.py b6c96:
6 blocks (regular, regular, gpool, regular, gpool, regular), trunk 96,
mid/regular 96 (64 in gpool blocks), gpool 32, p1/g1/v1 32, v2 64.
"""
import gzip
import struct
import numpy as np

rng = np.random.default_rng(20260817)
out = []

def w(tok):
    out.append(str(tok).encode() + b"\n")

def wfloats(arr):
    arr = np.asarray(arr, dtype="<f4").reshape(-1)
    out.append(b"@BIN@" + arr.tobytes() + b"\n")

def conv(name, ksize, inc, outc, scale=1.0):
    w(name); w(ksize); w(ksize); w(inc); w(outc); w(1); w(1)
    # file order y,x,ic,oc
    fan_in = ksize * ksize * inc
    wfloats(rng.standard_normal((ksize, ksize, inc, outc)) * (scale / np.sqrt(fan_in)))

def bn(name, c):
    w(name); w(c); w(1e-4); w(0); w(1)   # hasScale=0 hasBias=1
    wfloats(np.zeros(c))                 # mean
    wfloats(np.ones(c))                  # variance
    wfloats(rng.standard_normal(c) * 0.01)  # bias

def act(name):
    w(name)  # arch version 9 < 11: activation is just a name token (ReLU)

def matmul(name, inc, outc, scale=1.0):
    w(name); w(inc); w(outc)
    wfloats(rng.standard_normal((inc, outc)) * (scale / np.sqrt(inc)))

def matbias(name, c):
    w(name); w(c)
    wfloats(rng.standard_normal(c) * 0.01)

def ordinary_block(name, trunk_c, mid_c):
    w("ordinary_block"); w(name)
    bn(name + ".preBN", trunk_c)
    act(name + ".preAct")
    conv(name + ".regularConv", 3, trunk_c, mid_c)
    bn(name + ".midBN", mid_c)
    act(name + ".midAct")
    conv(name + ".finalConv", 3, mid_c, trunk_c, scale=0.3)

def gpool_block(name, trunk_c, regular_c, gpool_c):
    w("gpool_block"); w(name)
    bn(name + ".preBN", trunk_c)
    act(name + ".preAct")
    conv(name + ".regularConv", 3, trunk_c, regular_c)
    conv(name + ".gpoolConv", 3, trunk_c, gpool_c)
    bn(name + ".gpoolBN", gpool_c)
    act(name + ".gpoolAct")
    matmul(name + ".gpoolToBiasMul", gpool_c * 3, regular_c)
    bn(name + ".midBN", regular_c)
    act(name + ".midAct")
    conv(name + ".finalConv", 3, regular_c, trunk_c, scale=0.3)

VERSION = 9
IN_C, IN_G = 18, 1
TRUNK, MID, REGULAR, GPOOL = 96, 96, 64, 32
P1, G1, V1, V2 = 32, 32, 32, 64

w("coffee-b6c96-random-s0")
w(VERSION)
w(IN_C)
w(IN_G)

# ---- trunk ----
w("trunk"); w(6); w(TRUNK); w(MID); w(REGULAR); w(32); w(GPOOL)
conv("trunk.initialConv", 3, IN_C, TRUNK)
matmul("trunk.initialMatMul", IN_G, TRUNK)
ordinary_block("rconv1", TRUNK, MID)
ordinary_block("rconv2", TRUNK, MID)
gpool_block("rconv3", TRUNK, REGULAR, GPOOL)
ordinary_block("rconv4", TRUNK, MID)
gpool_block("rconv5", TRUNK, REGULAR, GPOOL)
ordinary_block("rconv6", TRUNK, MID)
bn("trunk.tipBN", TRUNK)
act("trunk.tipAct")

# ---- policy head (p2Conv out = 4 direction channels, repaired desc.cpp) ----
w("policyhead")
conv("p1Conv", 1, TRUNK, P1)
conv("g1Conv", 1, TRUNK, G1)
bn("g1BN", G1)
act("g1Act")
matmul("gpoolToBiasMul", G1 * 3, P1)
bn("p1BN", P1)
act("p1Act")
conv("p2Conv", 1, P1, 4)
matmul("gpoolToPassMul", G1 * 3, 1)

# ---- value head ----
w("valuehead")
conv("v1Conv", 1, TRUNK, V1)
bn("v1BN", V1)
act("v1Act")
matmul("v2Mul", V1 * 3, V2)
matbias("v2Bias", V2)
act("v2Act")
matmul("v3Mul", V2, 3)
matbias("v3Bias", 3)
matmul("sv3Mul", V2, 6)
matbias("sv3Bias", 6)
conv("vOwnershipConv", 1, V1, 1)

data = b"".join(out)
path = "models/coffee-b6c96-random.bin.gz"
import os
os.makedirs("models", exist_ok=True)
with gzip.open(path, "wb") as f:
    f.write(data)
print(f"wrote {path}: {len(data)} bytes uncompressed")
