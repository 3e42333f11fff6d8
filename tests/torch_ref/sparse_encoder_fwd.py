"""Reference-semantics torch forward for SparseEncoderSkeleton.

Computes the spconv math on a dense grid (numerically exact for the
small test grids): submanifold conv = conv3d * input-site mask; strided
SparseConv3d = conv3d(stride) * dilated mask; BatchNorm1d over ACTIVE
sites only (spconv applies BN to the packed feature matrix). Mirrors
mmdet3d/models/backbones/sparse_encoder.py:100-132 and
ops/spconv/conv.py:120-223.
"""
import torch
import torch.nn.functional as F


def _conv3d(x, weight, stride, padding):
    """x [1, C, X, Y, Z]; weight [k0, k1, k2, I, O] (spconv layout)."""
    w = weight.permute(4, 3, 0, 1, 2)  # [O, I, k0, k1, k2]
    return F.conv3d(x, w, stride=stride, padding=padding)


def _bn_masked(x, bn, mask):
    """BN1d over active sites of dense x [1, C, X, Y, Z]; mask [X, Y, Z].
    Uses eval-mode running stats (matching our eval-path comparison)."""
    mean = bn.running_mean.view(1, -1, 1, 1, 1)
    var = bn.running_var.view(1, -1, 1, 1, 1)
    y = (x - mean) / torch.sqrt(var + bn.eps)
    y = y * bn.weight.view(1, -1, 1, 1, 1) + bn.bias.view(1, -1, 1, 1, 1)
    return y * mask[None, None]


def _dilate(mask, ksize, stride, padding):
    m = mask[None, None].float()
    k = torch.ones((1, 1) + tuple(ksize))
    out = F.conv3d(m, k, stride=stride, padding=padding)
    return (out[0, 0] > 0).float()


def sparse_encoder_forward(skel, voxel_feats, coords, grid):
    """skel: SparseEncoderSkeleton (eval mode). voxel_feats [N, C];
    coords [N, 3] int (x, y, z); grid (X, Y, Z).
    Returns dense BEV map [X', Y', C_out * Z'] (channel = c*Z' + z)."""
    X, Y, Z = grid
    C = voxel_feats.shape[1]
    dense = torch.zeros(1, C, X, Y, Z)
    mask = torch.zeros(X, Y, Z)
    ix, iy, iz = coords[:, 0], coords[:, 1], coords[:, 2]
    dense[0, :, ix, iy, iz] = voxel_feats.T
    mask[ix, iy, iz] = 1.0

    def block_seq(seq, x, mask, stride, padding):
        """SparseSequential(conv, bn, relu)."""
        conv, bn = seq[0], seq[1]
        ks = conv.weight.shape[:3]
        y = _conv3d(x, conv.weight, stride, padding)
        new_mask = mask if stride == 1 or stride == (1, 1, 1) else \
            _dilate(mask, ks, stride, padding)
        if stride != 1 and stride != (1, 1, 1):
            new_mask = _dilate(mask, ks, stride, padding)
        else:
            new_mask = mask
        y = _bn_masked(y, bn, new_mask)
        return F.relu(y) * new_mask[None, None], new_mask

    def basic_block(bb, x, mask):
        y = _conv3d(x, bb.conv1.weight, 1, 1)
        y = F.relu(_bn_masked(y, bb.bn1, mask))
        y = _conv3d(y, bb.conv2.weight, 1, 1)
        y = _bn_masked(y, bb.bn2, mask)
        return F.relu(y + x) * mask[None, None]

    x, m = block_seq(skel.conv_input, dense, mask, 1, 1)

    layers = sorted(
        (name for name, _ in skel.encoder_layers.named_children()),
        key=lambda n: int(n.replace("encoder_layer", "")))
    n_layers = len(layers)
    for li, name in enumerate(layers):
        layer = getattr(skel.encoder_layers, name)
        for j, mod in enumerate(layer):
            if hasattr(mod, "conv1"):  # SparseBasicBlock
                x = basic_block(mod, x, m)
            else:  # strided transition
                x, m = block_seq(mod, x, m, 2, 1)

    # conv_out: kernel (1,1,3), stride (1,1,2), padding 0
    x, m = block_seq(skel.conv_out, x, m, (1, 1, 2), 0)

    # [1, C, X, Y, Z] -> [X, Y, C*Z] (channel = c*Z + z)
    _, Co, Xo, Yo, Zo = x.shape
    return x[0].permute(1, 2, 0, 3).reshape(Xo, Yo, Co * Zo)
