"""Independent PyTorch oracle for the RegNetY distillation teacher.

Hand-written eager torch from the published RegNetY math ("Designing
Network Design Spaces": bottleneck ratio 1, grouped 3x3, SE of ratio 0.25
on the block *input* width), with state-dict naming matching the timm
RegNet checkpoints (stem.conv / s{i}.b{j}.* / head.fc) that
models/convert.py::convert_regnet_state_dict consumes.
"""

import torch
import torch.nn.functional as F


def make_regnet_state(depths, widths, group_width, stem_width=8,
                      se_ratio=0.25, num_classes=10, seed=0):
    g = torch.Generator().manual_seed(seed)

    def r(*shape, scale=0.2):
        return (torch.randn(*shape, generator=g) * scale).float()

    s = {}

    def add_conv_bn(prefix, c_in, c_out, k):
        s[prefix + ".conv.weight"] = r(c_out, c_in, k, k)
        s[prefix + ".bn.weight"] = 1 + 0.1 * r(c_out)
        s[prefix + ".bn.bias"] = r(c_out)
        s[prefix + ".bn.running_mean"] = 0.1 * r(c_out)
        s[prefix + ".bn.running_var"] = (0.5 + 0.1 * r(c_out)).abs() + 0.5
        s[prefix + ".bn.num_batches_tracked"] = torch.tensor(0)

    add_conv_bn("stem", 3, stem_width, 3)
    w_in = stem_width
    for si, (depth, w_out) in enumerate(zip(depths, widths)):
        for bi in range(depth):
            p = f"s{si + 1}.b{bi + 1}"
            groups = max(w_out // group_width, 1)
            if bi == 0 or w_in != w_out:
                add_conv_bn(p + ".downsample", w_in, w_out, 1)
            add_conv_bn(p + ".conv1", w_in, w_out, 1)
            s[p + ".conv2.conv.weight"] = r(w_out, w_out // groups, 3, 3)
            s[p + ".conv2.bn.weight"] = 1 + 0.1 * r(w_out)
            s[p + ".conv2.bn.bias"] = r(w_out)
            s[p + ".conv2.bn.running_mean"] = 0.1 * r(w_out)
            s[p + ".conv2.bn.running_var"] = \
                (0.5 + 0.1 * r(w_out)).abs() + 0.5
            s[p + ".conv2.bn.num_batches_tracked"] = torch.tensor(0)
            w_se = int(round(w_in * se_ratio))
            s[p + ".se.fc1.weight"] = r(w_se, w_out, 1, 1)
            s[p + ".se.fc1.bias"] = r(w_se)
            s[p + ".se.fc2.weight"] = r(w_out, w_se, 1, 1)
            s[p + ".se.fc2.bias"] = r(w_out)
            add_conv_bn(p + ".conv3", w_out, w_out, 1)
            w_in = w_out
    s["head.fc.weight"] = r(num_classes, w_in)
    s["head.fc.bias"] = r(num_classes)
    return s


def _conv_bn(x, s, prefix, stride=1, groups=1, act=True):
    w = s[prefix + ".conv.weight"]
    pad = (w.shape[-1] - 1) // 2
    x = F.conv2d(x, w, None, stride=stride, padding=pad, groups=groups)
    x = F.batch_norm(
        x, s[prefix + ".bn.running_mean"], s[prefix + ".bn.running_var"],
        s[prefix + ".bn.weight"], s[prefix + ".bn.bias"],
        training=False, eps=1e-5)
    return F.relu(x) if act else x


def regnet_forward(state, x, depths, widths, group_width, stem_width=8,
                   se_ratio=0.25):
    """x: [B, 3, H, W] float32 (NCHW) -> logits."""
    s = state
    x = _conv_bn(x, s, "stem", stride=2)
    w_in = stem_width
    for si, (depth, w_out) in enumerate(zip(depths, widths)):
        for bi in range(depth):
            p = f"s{si + 1}.b{bi + 1}"
            stride = 2 if bi == 0 else 1
            groups = max(w_out // group_width, 1)
            shortcut = x
            if stride != 1 or w_in != w_out:
                shortcut = _conv_bn(x, s, p + ".downsample", stride,
                                    act=False)
            y = _conv_bn(x, s, p + ".conv1")
            y = _conv_bn(y, s, p + ".conv2", stride, groups=groups)
            se = y.mean((2, 3), keepdim=True)
            se = F.relu(F.conv2d(se, s[p + ".se.fc1.weight"],
                                 s[p + ".se.fc1.bias"]))
            se = torch.sigmoid(F.conv2d(se, s[p + ".se.fc2.weight"],
                                        s[p + ".se.fc2.bias"]))
            y = y * se
            y = _conv_bn(y, s, p + ".conv3", act=False)
            x = F.relu(shortcut + y)
            w_in = w_out
    x = x.mean((2, 3))
    return x @ s["head.fc.weight"].t() + s["head.fc.bias"]
