"""Reference-equivalent CPU baseline: the same classify pipeline in torch.

BASELINE.md requires the reference's CPU reads/s to be *measured*, but the
reference mount is empty (SURVEY.md §0) and there is no network to reinstall
Keras-era Deepbinner.  This module is the declared stand-in: the same
DemuxNet architecture and the same trim/normalise/window/combine pipeline,
implemented with numpy preprocessing + torch-CPU convolutions — the same
class of vendor-optimised CPU kernel library the reference rides (TF's C++
CPU runtime via Keras).  ``bench.py`` measures it on this host to produce
the ``vs_baseline`` denominator, clearly labelled as a proxy.

DO NOT use torch anywhere in the TPU compute path — this file exists only to
*be* the baseline.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np


def _get(tree, path: str):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return np.asarray(node)


def build_torch_model(net_cfg, variables):
    """Torch mirror of DemuxNet inference, weights copied from flax variables."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    params, stats = variables["params"], variables["batch_stats"]

    class ConvBNRelu(nn.Module):
        def __init__(self, scope, in_ch, out_ch, k, dilation=1):
            super().__init__()
            pad = (k - 1) // 2 * dilation
            self.conv = nn.Conv1d(in_ch, out_ch, k, padding=pad,
                                  dilation=dilation, bias=False)
            self.bn = nn.BatchNorm1d(out_ch, eps=1e-3)
            # flax Conv kernel: (width, in, out) → torch (out, in, width)
            self.conv.weight.data = torch.tensor(
                _get(params, f"{scope}/conv/kernel").transpose(2, 1, 0).copy()
            )
            self.bn.weight.data = torch.tensor(_get(params, f"{scope}/bn/scale"))
            self.bn.bias.data = torch.tensor(_get(params, f"{scope}/bn/bias"))
            self.bn.running_mean.data = torch.tensor(_get(stats, f"{scope}/bn/mean"))
            self.bn.running_var.data = torch.tensor(_get(stats, f"{scope}/bn/var"))

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class Inception(nn.Module):
        def __init__(self, scope, in_ch, features, dilation):
            super().__init__()
            quarter = features // 4
            self.b1 = ConvBNRelu(f"{scope}/branch1x1", in_ch, quarter, 1)
            self.b3 = ConvBNRelu(f"{scope}/branch3", in_ch,
                                 features - 3 * quarter, 3)
            self.bd = ConvBNRelu(f"{scope}/branch_dilated", in_ch, quarter, 3,
                                 dilation)
            self.bp = ConvBNRelu(f"{scope}/branch_pool", in_ch, quarter, 1)

        def forward(self, x):
            import torch

            pooled = F.max_pool1d(x, 3, stride=1, padding=1)
            return torch.cat(
                [self.b1(x), self.b3(x), self.bd(x), self.bp(pooled)], dim=1
            )

    class TorchDemuxNet(nn.Module):
        def __init__(self):
            super().__init__()
            layers: List[nn.Module] = []
            layers.append(ConvBNRelu("stem1", 1, net_cfg.stem_features, 3))
            layers.append(ConvBNRelu("stem2", net_cfg.stem_features,
                                     net_cfg.stem_features, 3))
            layers.append(nn.MaxPool1d(2))
            in_ch = net_cfg.stem_features
            for i, feats in enumerate(net_cfg.block_features):
                layers.append(ConvBNRelu(f"block{i}_conv1", in_ch, feats, 3))
                layers.append(ConvBNRelu(f"block{i}_conv2", feats, feats, 3))
                layers.append(nn.MaxPool1d(2))
                in_ch = feats
            for i, feats in enumerate(net_cfg.inception_features):
                layers.append(Inception(f"inception{i}", in_ch, feats, 2 ** (i + 1)))
                layers.append(nn.MaxPool1d(2))
                in_ch = feats
            layers.append(ConvBNRelu("head_conv", in_ch, net_cfg.head_features, 3))
            self.features = nn.Sequential(*layers)
            self.classifier = nn.Linear(net_cfg.head_features, net_cfg.num_classes)
            self.classifier.weight.data = torch.tensor(
                _get(params, "classifier/kernel").T.copy()
            )
            self.classifier.bias.data = torch.tensor(
                _get(params, "classifier/bias")
            )

        def forward(self, x):  # (B, L) float32 → (B, C) probabilities
            import torch

            h = self.features(x[:, None, :])
            h = h.mean(dim=2)
            return torch.softmax(self.classifier(h), dim=-1)

    model = TorchDemuxNet()
    model.eval()
    return model


def preprocess_read(signal: np.ndarray, pre_cfg) -> np.ndarray:
    """Host-side trim + window + normalise, mirroring ops.preprocess."""
    window, stride = pre_cfg.window, pre_cfg.stride
    # Raw region = trim headroom + scan, regardless of where the pipeline
    # under test runs its trim (host_trim shrinks buffer_size to scan_size,
    # but this oracle always trims host-side from the full raw slice).
    sig = signal[: pre_cfg.trim_scan + pre_cfg.scan_size].astype(np.float32)
    region = sig[: pre_cfg.trim_scan]
    trim = 0
    if region.size >= pre_cfg.trim_window:
        global_std = region.std()
        view = np.lib.stride_tricks.sliding_window_view(
            region, pre_cfg.trim_window
        )[:: pre_cfg.trim_stride]
        stds = view.std(axis=1)
        good = stds >= pre_cfg.trim_threshold * global_std
        if good.any():
            trim = int(np.argmax(good)) * pre_cfg.trim_stride
    trim = min(trim, max(sig.size - window, 0))
    scan = sig[trim : trim + pre_cfg.scan_size]
    windows = []
    for start in range(0, max(scan.size - window, 0) + 1, stride):
        chunk = scan[start : start + window]
        if chunk.size < window:
            break
        windows.append((chunk - chunk.mean()) / (chunk.std() + 1e-8))
    if not windows:
        return np.zeros((0, window), np.float32)
    return np.stack(windows)


def combine_window_probs_np(probs: np.ndarray,
                            rule: str = "neighbour") -> np.ndarray:
    """EXACT numpy port of ops.calling.combine_window_probs for one read.

    ``probs``: (W, C) — the read's valid windows only (the host pipeline
    here never builds padding windows, so the mask is all-true and the
    masked branches of the device function reduce away).  W == 0 → the
    all-"none" row, as on device.
    """
    num_windows = probs.shape[0]
    if num_windows == 0:
        none_row = np.zeros(probs.shape[1] or 13, np.float32)
        none_row[0] = 1.0
        return none_row
    strength = probs[:, 1:].max(axis=-1)
    best = int(np.argmax(strength))
    if rule == "best":
        return probs[best].copy()
    left = min(max(best - 1, 0), num_windows - 1)
    right = min(max(best + 1, 0), num_windows - 1)
    neighbour = left if strength[left] >= strength[right] else right
    return 0.5 * (probs[best] + probs[neighbour])


def call_one_end_np(combined: np.ndarray, call_cfg) -> int:
    """EXACT numpy port of ops.calling.call_one_end for one read."""
    barcode_probs = combined[1:]
    best = int(np.argmax(barcode_probs)) + 1
    order = np.sort(barcode_probs)
    top1, top2 = order[-1], order[-2]
    confident = (
        top1 > 0.0
        and top1 >= call_cfg.min_score
        and top1 - top2 >= call_cfg.score_diff
    )
    return best if confident else 0


def torch_classify_fn(
    net_cfg, variables, pre_cfg, call_cfg, read_batch: int = 256,
    return_probs: bool = False,
) -> Callable[[List[Tuple[str, np.ndarray]]], list]:
    """fn(list[(read_id, signal)]) -> list[(read_id, call_idx)].

    Batched the way the reference batches (SURVEY.md §3.1): ALL windows of a
    ``read_batch``-read chunk are stacked into one forward (hundreds of
    windows per ``model(...)`` call), then split back per read for the
    combine.  The combine and call rules are exact numpy ports of
    ops.calling (round-2 VERDICT item 3 — the baseline must compute the
    same function as the device path, fairly batched).
    """
    import torch

    model = build_torch_model(net_cfg, variables)

    def classify(reads):
        results = []
        for chunk_start in range(0, len(reads), read_batch):
            chunk = reads[chunk_start : chunk_start + read_batch]
            window_stacks = [
                preprocess_read(signal, pre_cfg) for _read_id, signal in chunk
            ]
            counts = [w.shape[0] for w in window_stacks]
            stacked = (
                np.concatenate([w for w in window_stacks if w.shape[0]])
                if any(counts) else np.zeros((0, pre_cfg.window), np.float32)
            )
            if stacked.shape[0]:
                with torch.no_grad():
                    all_probs = model(torch.tensor(stacked)).numpy()
            else:
                all_probs = np.zeros((0, net_cfg.num_classes), np.float32)
            offset = 0
            for (read_id, _signal), count in zip(chunk, counts):
                probs = all_probs[offset : offset + count]
                offset += count
                combined = combine_window_probs_np(
                    probs, rule=getattr(call_cfg, "combine", "neighbour"))
                call = call_one_end_np(combined, call_cfg)
                if return_probs:
                    results.append((read_id, call, combined))
                else:
                    results.append((read_id, call))
        return results

    return classify
