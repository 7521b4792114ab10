"""NumPy oracle of the reference's message-passing math, written directly
from the equations in SURVEY.md §3.4 (scatter-based, unpadded). Used as the
golden model for parity tests of the scatter-free TPU ops."""

import numpy as np


def scatter_sum(src, index, dim_size):
    out = np.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    np.add.at(out, index, src)
    return out


def relu(x):
    return np.maximum(x, 0.0)


def layer_norm(x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps)


def mlp(weights, biases, x, layer_normalized=True):
    for w, b in zip(weights[:-1], biases[:-1]):
        x = relu(x @ w + b)
    x = x @ weights[-1] + biases[-1]
    return layer_norm(x) if layer_normalized else x


def gmp(edge_w, edge_b, node_w, node_b, x, senders, receivers, pos):
    x_i, x_j = x[senders], x[receivers]
    p_i, p_j = pos[senders], pos[receivers]
    d = p_i - p_j
    norm = np.linalg.norm(d, axis=-1, keepdims=True)
    e_in = np.concatenate([d, norm, x_i, x_j], axis=-1)
    e = mlp(edge_w, edge_b, e_in, True)
    aggr = scatter_sum(e, receivers, x.shape[0])
    return mlp(node_w, node_b, np.concatenate([x, aggr], axis=-1), True) + x


def cal_ew(w, senders, receivers, n):
    deg = np.bincount(senders, minlength=n).astype(np.float64)
    normed_w = w[:, 0] / deg
    w_send = normed_w[senders]
    aggr_w = scatter_sum(w_send, receivers, n) + 1e-12
    ec = w_send / aggr_w[receivers]
    return ec, aggr_w[:, None]


def edge_conv(x, senders, receivers, ew, aggregating=True):
    if aggregating:
        msg = x[senders] * ew[:, None]
        return scatter_sum(msg, receivers, x.shape[0])
    msg = x[receivers] * ew[:, None]
    return scatter_sum(msg, senders, x.shape[0])


def unpool(h, pre_n, idx):
    out = np.zeros((pre_n, h.shape[-1]), dtype=h.dtype)
    out[idx] = h
    return out
