"""Plain-torch forwards for the remaining flagship modules (eval mode),
over the parameter-only skeletons in skeleton.py:

  GeneralizedLSSFPN  mmdet3d/models/necks/generalized_lss.py:80-103
  SECOND             mmdet3d/models/backbones/second.py:55-68
  SECONDFPN          mmdet3d/models/necks/second.py:83-99
  ConvFuser          mmdet3d/models/fusers/conv.py:12-23
"""
import torch
import torch.nn.functional as F


def conv_module(m, x):
    return F.relu(m.bn(m.conv(x)))


def generalized_lss_fpn_forward(skel, inputs):
    """inputs: list of NCHW maps (shallow->deep). Returns the fpn outs
    (all but the deepest level), processed top-down with concat."""
    laterals = list(inputs)
    used = len(laterals) - 1
    for i in range(used - 1, -1, -1):
        x = F.interpolate(laterals[i + 1], size=laterals[i].shape[2:],
                          mode="bilinear", align_corners=False)
        laterals[i] = torch.cat([laterals[i], x], dim=1)
        laterals[i] = conv_module(skel.lateral_convs[i], laterals[i])
        laterals[i] = conv_module(skel.fpn_convs[i], laterals[i])
    return [laterals[i] for i in range(used)]


def second_forward(skel, x):
    outs = []
    for block in skel.blocks:
        x = block(x)
        outs.append(x)
    return outs


def secondfpn_forward(skel, xs):
    ups = [deb(xs[i]) for i, deb in enumerate(skel.deblocks)]
    return torch.cat(ups, dim=1) if len(ups) > 1 else ups[0]


def convfuser_forward(skel, feats):
    """skel = ConvFuserSkeleton (Sequential conv/bn/relu); feats list of
    NCHW maps, concatenated on channels."""
    return skel(torch.cat(feats, dim=1))
