"""Full-model forward parity: flax RTM3D (DLA-34) vs an independent torch
re-statement of the reference architecture, weights imported through the
checkpoint name-translation path.

This is the parity linchpin test (SURVEY.md hard-parts #3/#4): it exercises
the DLA Tree recursion naming, the KFPN transposed-conv semantics, the header
Sequential layout and the BN eps handling in one shot. The torch modules
below are written from the reference's structure (models/nets/dla.py,
keypoint_fpn_fusion.py, header.py, torch_utils.make_conv_level) as a test
oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

EPS = 1e-4


def make_conv_level(cin, cout, k, num, bias=False, dilation=1):
    if isinstance(dilation, int):
        dilation = [dilation] * num
    chans = [cin] * (num - 1) + [cout]
    mods = []
    c = cin
    for i in range(num):
        pad = (k - 1) * dilation[i] // 2
        mods += [
            nn.Conv2d(c, chans[i], k, 1, pad, dilation=dilation[i], bias=bias),
            nn.BatchNorm2d(chans[i], eps=EPS),
            nn.ReLU(inplace=True),
        ]
        c = chans[i]
    return nn.Sequential(*mods)


class TBasic(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.norm1 = nn.BatchNorm2d(cout, eps=EPS)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(cout, eps=EPS)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        out = self.relu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        return self.relu(out + residual)


class TRoot(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1, 1, bias=False)
        self.norm = nn.BatchNorm2d(cout, eps=EPS)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, *x):
        return self.relu(self.norm(self.conv(torch.cat(x, 1))))


class TTree(nn.Module):
    def __init__(self, level, cin, cout, stride=1, level_root=False, root_dim=0):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * cout
        if level_root:
            root_dim += cin
        if level == 1:
            self.tree1 = TBasic(cin, cout, stride)
            self.tree2 = TBasic(cout, cout, 1)
            self.root = TRoot(root_dim, cout)
        else:
            self.tree1 = TTree(level - 1, cin, cout, stride, root_dim=0)
            self.tree2 = TTree(level - 1, cout, cout, root_dim=root_dim + cout)
        self.level = level
        self.level_root = level_root
        self.downsample = nn.MaxPool2d(stride, stride=stride) if stride > 1 else None
        self.project = (
            nn.Sequential(
                nn.Conv2d(cin, cout, 1, 1, bias=False), nn.BatchNorm2d(cout, eps=EPS)
            )
            if cin != cout
            else None
        )

    def forward(self, x, residual=None, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if self.downsample else x
        residual = self.project(bottom) if self.project else bottom
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual)
        if self.level == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class TDLA(nn.Module):
    def __init__(self):
        super().__init__()
        ch = [16, 32, 64, 128, 256, 512]
        self.base_layer = nn.Sequential(
            nn.Conv2d(3, ch[0], 7, 1, 3, bias=False),
            nn.BatchNorm2d(ch[0], eps=EPS),
            nn.ReLU(inplace=True),
        )
        self.level0 = make_conv_level(ch[0], ch[0], 3, 1)
        self.level1 = make_conv_level(ch[0], ch[1], 3, 1)
        # stride handled below: reference passes stride=2 into make_conv_level
        self.level1[0].stride = (2, 2)
        self.level2 = TTree(1, ch[1], ch[2], 2, False)
        self.level3 = TTree(2, ch[2], ch[3], 2, True)
        self.level4 = TTree(2, ch[3], ch[4], 2, True)
        self.level5 = TTree(1, ch[4], ch[5], 2, True)

    def forward(self, x):
        x = self.base_layer(x)
        x = self.level0(x)
        x = self.level1(x)
        y = []
        for name in ("level2", "level3", "level4", "level5"):
            x = getattr(self, name)(x)
            y.append(x)
        return y


class TUpSample(nn.Module):
    def __init__(self, c1, c2=None, k=2):
        super().__init__()
        c2 = c2 or c1
        self.conv_tran = nn.ConvTranspose2d(c1, c2, k * 2, stride=k, padding=k // 2, bias=False)

    def forward(self, x):
        return self.conv_tran(x)


class TKFPN(nn.Module):
    def __init__(self, chans=(64, 128, 256, 512), out_ch=256):
        super().__init__()
        levels = [2, 3, 4, 5]
        for i in range(3, 0, -1):
            setattr(self, f"kfpn_head{levels[i]}", nn.Conv2d(chans[i], out_ch, 1, 1, bias=True))
            setattr(self, f"kfpn_up{levels[i]}", TUpSample(out_ch))
            setattr(self, f"kfpn_proj{levels[i]}", nn.Conv2d(chans[i - 1] + out_ch, chans[i - 1], 1, 1, bias=True))
        setattr(self, f"kfpn_head{levels[0]}", nn.Conv2d(chans[0], out_ch, 1, 1, bias=True))
        for i in range(3, 0, -1):
            setattr(self, f"fusion_up{levels[i]}", nn.Sequential(*[TUpSample(out_ch) for _ in range(levels[i] - 2)]))

    def forward(self, x):
        levels = [2, 3, 4, 5]
        x = list(x)
        for i in range(3, 0, -1):
            x[i] = getattr(self, f"kfpn_head{levels[i]}")(x[i])
            up = getattr(self, f"kfpn_up{levels[i]}")(x[i])
            x[i - 1] = getattr(self, f"kfpn_proj{levels[i]}")(torch.cat([up, x[i - 1]], 1))
        x[0] = getattr(self, "kfpn_head2")(x[0])
        z = x[0]
        for i in range(3, 0, -1):
            o = getattr(self, f"fusion_up{levels[i]}")(x[i])
            bs, c, h, w = o.shape
            att = torch.softmax(o.detach().view(bs, c, -1), dim=-1).view(bs, c, h, w)
            z = z + o * att
        return z


class THeader(nn.Module):
    def __init__(self, in_ch=256, num_cls=3, num_conv=2):
        super().__init__()
        dil = [6] + [1] * (num_conv - 1)
        for name, out in (
            ("main_kf", num_cls),
            ("offset_fr_main", 16),
            ("main_offset", 2),
            ("vertex_offset", 2),
        ):
            seq = make_conv_level(in_ch, in_ch, 3, num_conv, bias=True, dilation=dil)
            seq.add_module(f"{name}_head", nn.Conv2d(in_ch, out, 3, padding=1, bias=True))
            setattr(self, f"{name}_header", seq)

    def forward(self, x):
        return (
            self.main_kf_header(x),
            self.offset_fr_main_header(x),
            self.main_offset_header(x),
            self.vertex_offset_header(x),
        )


class TModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TDLA()
        self.kfpn_fusion = TKFPN()
        self.detect_header = THeader()

    def forward(self, x):
        return self.detect_header(self.kfpn_fusion(self.backbone(x)))


def test_full_dla34_model_parity(rng):
    from rtm3d_tpu.config import default_config
    from rtm3d_tpu.nn.model import init_model
    from rtm3d_tpu.train.checkpoint import import_torch_weights

    torch.manual_seed(5)
    tm = TModel().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.02)
                m.running_var.uniform_(0.9, 1.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    cfg = default_config()
    cfg.INPUT_SIZE = (64, 64)
    model, variables = init_model(cfg, jax.random.PRNGKey(0))
    variables, report = import_torch_weights(variables, sd)
    assert not report["missed"], report["missed"][:12]
    n_expected = len([k for k in sd if "num_batches_tracked" not in k])
    assert len(report["loaded"]) == n_expected  # every torch tensor consumed

    x = rng.randn(1, 64, 64, 3).astype(np.float32) * 0.5
    got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(x)
    )
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    for g, r in zip(got, ref):
        a = np.asarray(g).transpose(0, 3, 1, 2)
        b = r.numpy()
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=1e-2)
