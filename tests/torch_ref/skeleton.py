"""Plain-torch skeleton of the reference BEVFusion module tree.

Reproduces the exact state_dict key names and tensor shapes of the
released checkpoints (mmdet3d/models/fusion_models/bevfusion.py:26-99
plus mmdet's SwinTransformer naming) WITHOUT mmcv/mmdet/spconv: only
the parameter/buffer structure matters here. Used to validate the
checkpoint adapter's key mapping exhaustively (runtime/adapter.py) and
to carry weights for the golden module-parity tests.

Structure sources (file:line):
  Swin naming        mmdet SwinTransformer (stages.N.blocks.M.attn.w_msa...)
  GeneralizedLSSFPN  mmdet3d/models/necks/generalized_lss.py:13-103
  DepthLSSTransform  mmdet3d/models/vtransforms/depth_lss.py:38-76
  SparseEncoder      mmdet3d/models/backbones/sparse_encoder.py:63-216
  SparseBasicBlock   mmdet3d/ops/sparse_block.py:42-47 (conv1/bn1/conv2/bn2)
  ConvFuser          mmdet3d/models/fusers/conv.py:12-23
  SECOND/SECONDFPN   mmdet3d/models/{backbones/second.py,necks/second.py}
  TransFusionHead    mmdet3d/models/heads/bbox/transfusion.py:120-214
  TransformerDecoder mmdet3d/models/utils/transformer.py:33-112
"""
import torch
import torch.nn as nn


class SpConv3d(nn.Module):
    """Parameter-only stand-in for spconv SparseConv3d / SubMConv3d:
    weight [k0, k1, k2, Cin, Cout] (ops/spconv/conv.py:100)."""

    def __init__(self, cin, cout, ksize):
        super().__init__()
        if isinstance(ksize, int):
            ksize = (ksize,) * 3
        self.weight = nn.Parameter(torch.randn(*ksize, cin, cout) * 0.05)


class SparseBasicBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = SpConv3d(c, c, 3)
        self.bn1 = nn.BatchNorm1d(c)
        self.conv2 = SpConv3d(c, c, 3)
        self.bn2 = nn.BatchNorm1d(c)


def sparse_convmodule(cin, cout, ksize):
    return nn.Sequential(SpConv3d(cin, cout, ksize), nn.BatchNorm1d(cout),
                         nn.ReLU(True))


class SparseEncoderSkeleton(nn.Module):
    """basicblock variant, encoder_channels
    [[16,16,32],[32,32,64],[64,64,128],[128,128]]."""

    def __init__(self, in_channels=5, base=16,
                 channels=((16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128)),
                 output_channels=128):
        super().__init__()
        self.conv_input = sparse_convmodule(in_channels, base, 3)
        self.encoder_layers = nn.Module()
        cin = base
        n = len(channels)
        for i, blocks in enumerate(channels):
            layer = nn.Sequential()
            for j, c in enumerate(blocks):
                if j == len(blocks) - 1 and i != n - 1:
                    layer.add_module(str(j), sparse_convmodule(cin, c, 3))
                else:
                    layer.add_module(str(j), SparseBasicBlock(c))
                cin = c
            self.encoder_layers.add_module(f"encoder_layer{i + 1}", layer)
        self.conv_out = sparse_convmodule(cin, output_channels, (1, 1, 3))


class WindowMSA(nn.Module):
    def __init__(self, dim, heads, window=7):
        super().__init__()
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window - 1) ** 2, heads))
        self.register_buffer(
            "relative_position_index", torch.zeros(window * window,
                                                   window * window).long())
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)


class ShiftWindowMSA(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.w_msa = WindowMSA(dim, heads)


class FFN(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(dim, hidden), nn.GELU()),
            nn.Linear(hidden, dim),
        )


class SwinBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = ShiftWindowMSA(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.ffn = FFN(dim, dim * 4)


class PatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)


class SwinStage(nn.Module):
    def __init__(self, dim, depth, heads, downsample):
        super().__init__()
        self.blocks = nn.Sequential(*[SwinBlock(dim, heads) for _ in range(depth)])
        if downsample:
            self.downsample = PatchMerging(dim)


class PatchEmbed(nn.Module):
    def __init__(self, embed=96):
        super().__init__()
        self.projection = nn.Conv2d(3, embed, 4, stride=4)
        self.norm = nn.LayerNorm(embed)


class SwinSkeleton(nn.Module):
    """Swin-T: embed 96, depths (2,2,6,2), heads (3,6,12,24),
    out_indices (1,2,3) -> norm1/2/3."""

    def __init__(self, embed=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
                 out_indices=(1, 2, 3)):
        super().__init__()
        self.patch_embed = PatchEmbed(embed)
        dims = [embed * (2 ** i) for i in range(len(depths))]
        self.stages = nn.Sequential(*[
            SwinStage(dims[i], depths[i], heads[i], i < len(depths) - 1)
            for i in range(len(depths))
        ])
        for i in out_indices:
            self.add_module(f"norm{i}", nn.LayerNorm(dims[i]))


class ConvModule(nn.Module):
    def __init__(self, cin, cout, k, bias=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=bias)
        self.bn = nn.BatchNorm2d(cout)


class GeneralizedLSSFPNSkeleton(nn.Module):
    def __init__(self, in_channels=(192, 384, 768), out=256):
        super().__init__()
        # top-down: the deepest lateral concatenates the two deepest
        # inputs; shallower ones concatenate the previous fpn OUTPUT
        # (generalized_lss.py:80-103)
        n = len(in_channels) - 1
        ins = [in_channels[i] + (in_channels[i + 1] if i == n - 1 else out)
               for i in range(n)]
        self.lateral_convs = nn.ModuleList(
            [ConvModule(c, out, 1) for c in ins])
        self.fpn_convs = nn.ModuleList(
            [ConvModule(out, out, 3) for _ in ins])


class DepthLSSSkeleton(nn.Module):
    def __init__(self, in_channels=256, out_channels=80, D=118):
        super().__init__()
        self.dtransform = nn.Sequential(
            nn.Conv2d(1, 8, 1), nn.BatchNorm2d(8), nn.ReLU(True),
            nn.Conv2d(8, 32, 5, stride=4, padding=2), nn.BatchNorm2d(32), nn.ReLU(True),
            nn.Conv2d(32, 64, 5, stride=2, padding=2), nn.BatchNorm2d(64), nn.ReLU(True),
        )
        self.depthnet = nn.Sequential(
            nn.Conv2d(in_channels + 64, in_channels, 3, padding=1),
            nn.BatchNorm2d(in_channels), nn.ReLU(True),
            nn.Conv2d(in_channels, in_channels, 3, padding=1),
            nn.BatchNorm2d(in_channels), nn.ReLU(True),
            nn.Conv2d(in_channels, D + out_channels, 1),
        )
        self.downsample = nn.Sequential(
            nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU(True),
            nn.Conv2d(out_channels, out_channels, 3, stride=2, padding=1, bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU(True),
            nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
            nn.BatchNorm2d(out_channels), nn.ReLU(True),
        )


class SECONDSkeleton(nn.Module):
    def __init__(self, cin=256, outs=(128, 256), layers=(5, 5),
                 strides=(1, 2)):
        super().__init__()
        blocks = []
        for i, (c, n) in enumerate(zip(outs, layers)):
            # each stage's lead conv carries the stage stride
            # (reference SECOND layer_strides [1, 2],
            # models/backbones/second.py:37-52)
            mods = [nn.Conv2d(cin, c, 3, padding=1, stride=strides[i],
                              bias=False),
                    nn.BatchNorm2d(c), nn.ReLU(True)]
            for _ in range(n):
                mods += [nn.Conv2d(c, c, 3, padding=1, bias=False),
                         nn.BatchNorm2d(c), nn.ReLU(True)]
            blocks.append(nn.Sequential(*mods))
            cin = c
        self.blocks = nn.ModuleList(blocks)


class SECONDFPNSkeleton(nn.Module):
    def __init__(self, ins=(128, 256), outs=(256, 256), strides=(1, 2)):
        super().__init__()
        debs = []
        for cin, cout, s in zip(ins, outs, strides):
            if s > 1:
                conv = nn.ConvTranspose2d(cin, cout, s, stride=s, bias=False)
            else:
                conv = nn.Conv2d(cin, cout, 1, bias=False)
            debs.append(nn.Sequential(conv, nn.BatchNorm2d(cout), nn.ReLU(True)))
        self.deblocks = nn.ModuleList(debs)


class PositionEmbeddingLearned(nn.Module):
    def __init__(self, cin, dim=128):
        super().__init__()
        self.position_embedding_head = nn.Sequential(
            nn.Conv1d(cin, dim, 1), nn.BatchNorm1d(dim), nn.ReLU(True),
            nn.Conv1d(dim, dim, 1))


class DecoderLayerSkeleton(nn.Module):
    def __init__(self, d=128, heads=8, ff=256):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads)
        self.multihead_attn = nn.MultiheadAttention(d, heads)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)
        self.self_posembed = PositionEmbeddingLearned(2, d)
        self.cross_posembed = PositionEmbeddingLearned(2, d)


class TransFusionHeadSkeleton(nn.Module):
    def __init__(self, cin=512, hidden=64, d=128, num_classes=10):
        super().__init__()
        self.shared_conv = nn.Conv2d(cin, d, 3, padding=1)
        self.heatmap_head = nn.Sequential(
            ConvModule(d, d, 3), nn.Conv2d(d, num_classes, 3, padding=1))
        self.class_encoding = nn.Conv1d(num_classes, d, 1)
        self.decoder = nn.ModuleList([DecoderLayerSkeleton(d)])
        heads = dict(center=2, height=1, dim=3, rot=2, vel=2,
                     heatmap=num_classes)
        ph = nn.Module()
        for name, out in heads.items():
            ph.add_module(name, nn.Sequential(
                nn.Conv1d(d, hidden, 1), nn.BatchNorm1d(hidden), nn.ReLU(True),
                nn.Conv1d(hidden, out, 1)))
        self.prediction_heads = nn.ModuleList([ph])


class ConvFuserSkeleton(nn.Sequential):
    def __init__(self, cin=336, cout=256):
        super().__init__(nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                         nn.BatchNorm2d(cout), nn.ReLU(True))


class BEVFusionSkeleton(nn.Module):
    """Full flagship (convfuser.yaml) module tree."""

    def __init__(self):
        super().__init__()
        cam = nn.Module()
        cam.backbone = SwinSkeleton()
        cam.neck = GeneralizedLSSFPNSkeleton()
        cam.vtransform = DepthLSSSkeleton()
        lidar = nn.Module()
        lidar.backbone = SparseEncoderSkeleton()
        self.encoders = nn.Module()
        self.encoders.camera = cam
        self.encoders.lidar = lidar
        self.fuser = ConvFuserSkeleton()
        self.decoder = nn.Module()
        self.decoder.backbone = SECONDSkeleton()
        self.decoder.neck = SECONDFPNSkeleton()
        self.heads = nn.Module()
        self.heads.object = TransFusionHeadSkeleton()


class SeparateHeadSkeleton(nn.Module):
    """CenterHead SeparateHead (centerpoint.py:19-127): per-branch
    Sequential of (num_conv-1) x ConvModule + final Conv2d (bias)."""

    def __init__(self, cin=64, heads=None, head_conv=64, final_kernel=3):
        super().__init__()
        heads = heads or {}
        for name, (classes, num_conv) in heads.items():
            layers, c = [], cin
            for _ in range(num_conv - 1):
                layers.append(ConvModule(c, head_conv, final_kernel))
                c = head_conv
            layers.append(nn.Conv2d(c, classes, final_kernel,
                                    padding=final_kernel // 2, bias=True))
            self.add_module(name, nn.Sequential(*layers))


class CenterHeadSkeleton(nn.Module):
    """CenterHead (centerpoint.py:248-354): shared ConvModule +
    task_heads ModuleList of SeparateHeads."""

    def __init__(self, cin=256, share=64, task_classes=(1, 2, 2, 1, 2, 2),
                 common=None, head_conv=64, final_kernel=3):
        super().__init__()
        common = common or dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                                rot=(2, 2), vel=(2, 2))
        self.shared_conv = ConvModule(cin, share, 3)
        self.task_heads = nn.ModuleList()
        for ncls in task_classes:
            heads = dict(common)
            heads["heatmap"] = (ncls, 2)
            self.task_heads.append(
                SeparateHeadSkeleton(share, heads, head_conv, final_kernel))


class BEVSegmentationHeadSkeleton(nn.Module):
    """segm/vanilla.py:102-111 classifier Sequential."""

    def __init__(self, cin=256, num_classes=6):
        super().__init__()
        self.classifier = nn.Sequential(
            nn.Conv2d(cin, cin, 3, padding=1, bias=False),
            nn.BatchNorm2d(cin), nn.ReLU(True),
            nn.Conv2d(cin, cin, 3, padding=1, bias=False),
            nn.BatchNorm2d(cin), nn.ReLU(True),
            nn.Conv2d(cin, num_classes, 1),
        )


class ResBasicBlock(nn.Module):
    """mmcv.cnn.resnet.BasicBlock naming (conv1/bn1/conv2/bn2 +
    downsample Sequential)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))


class GeneralizedResNetSkeleton(nn.ModuleList):
    """backbones/resnet.py:13-40: ModuleList of res-layers."""

    def __init__(self, cin=80, blocks=((2, 160, 2), (2, 320, 2), (2, 640, 1))):
        super().__init__()
        for num_blocks, cout, stride in blocks:
            mods = []
            for b in range(num_blocks):
                mods.append(ResBasicBlock(cin, cout, stride if b == 0 else 1))
                cin = cout
            self.append(nn.Sequential(*mods))


class LSSFPNSkeleton(nn.Module):
    """necks/lss.py:13-65: fuse Sequential + optional upsample."""

    def __init__(self, in_channels=(640, 160), out=256, scale_factor=1):
        super().__init__()
        self.fuse = nn.Sequential(
            nn.Conv2d(in_channels[0] + in_channels[1], out, 1, bias=False),
            nn.BatchNorm2d(out), nn.ReLU(True),
            nn.Conv2d(out, out, 3, padding=1, bias=False),
            nn.BatchNorm2d(out), nn.ReLU(True),
        )
        if scale_factor > 1:
            self.upsample = nn.Sequential(
                nn.Upsample(scale_factor=scale_factor, mode="bilinear",
                            align_corners=True),
                nn.Conv2d(out, out, 3, padding=1, bias=False),
                nn.BatchNorm2d(out), nn.ReLU(True),
            )


class LSSTransformSkeleton(nn.Module):
    """Plain LSSTransform (lss.py:14-57): single depthnet Conv2d +
    optional stride-2 downsample Sequential."""

    def __init__(self, cin=256, cout=80, D=118, downsample=1):
        super().__init__()
        self.depthnet = nn.Conv2d(cin, D + cout, 1)
        if downsample > 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(True),
                nn.Conv2d(cout, cout, 3, stride=downsample, padding=1,
                          bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(True),
                nn.Conv2d(cout, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout), nn.ReLU(True),
            )


class CameraOnlyDetSkeleton(nn.Module):
    """Camera-only det baseline (centerhead/lssfpn/camera/256x704/swint):
    Swin + GeneralizedLSSFPN + LSSTransform + GeneralizedResNet +
    LSSFPN + CenterHead."""

    def __init__(self):
        super().__init__()
        cam = nn.Module()
        cam.backbone = SwinSkeleton()
        cam.neck = GeneralizedLSSFPNSkeleton()
        cam.vtransform = LSSTransformSkeleton(downsample=2)
        self.encoders = nn.Module()
        self.encoders.camera = cam
        self.decoder = nn.Module()
        # swint leaf overrides decoder widths to 128/256/512
        # (configs/.../camera/256x704/swint/default.yaml:47-59)
        self.decoder.backbone = GeneralizedResNetSkeleton(
            blocks=((2, 128, 2), (2, 256, 2), (2, 512, 1)))
        self.decoder.neck = LSSFPNSkeleton(in_channels=(512, 128),
                                           scale_factor=2)
        self.heads = nn.Module()
        self.heads.object = CenterHeadSkeleton(cin=256)


class CameraOnlySegSkeleton(nn.Module):
    """Camera-only seg baseline (seg/camera-bev256d2.yaml)."""

    def __init__(self):
        super().__init__()
        cam = nn.Module()
        cam.backbone = SwinSkeleton()
        cam.neck = GeneralizedLSSFPNSkeleton()
        cam.vtransform = LSSTransformSkeleton(downsample=2)
        self.encoders = nn.Module()
        self.encoders.camera = cam
        self.decoder = nn.Module()
        self.decoder.backbone = GeneralizedResNetSkeleton()
        self.decoder.neck = LSSFPNSkeleton(scale_factor=2)
        self.heads = nn.Module()
        self.heads.map = BEVSegmentationHeadSkeleton(cin=256)


class LidarOnlyDetSkeleton(nn.Module):
    """LiDAR-only TransFusion-L baseline (voxelnet_0p075.yaml)."""

    def __init__(self):
        super().__init__()
        lidar = nn.Module()
        lidar.backbone = SparseEncoderSkeleton()
        self.encoders = nn.Module()
        self.encoders.lidar = lidar
        self.decoder = nn.Module()
        self.decoder.backbone = SECONDSkeleton()
        self.decoder.neck = SECONDFPNSkeleton()
        self.heads = nn.Module()
        self.heads.object = TransFusionHeadSkeleton(cin=512)


class FusedSegSkeleton(nn.Module):
    """Fused C+L seg baseline (seg/fusion-bev256d2-lss.yaml)."""

    def __init__(self):
        super().__init__()
        cam = nn.Module()
        cam.backbone = SwinSkeleton()
        cam.neck = GeneralizedLSSFPNSkeleton()
        cam.vtransform = LSSTransformSkeleton(downsample=2)
        lidar = nn.Module()
        # seg lidar encoder: sparse_shape [1024,1024,41], conv_out pad
        # asymmetric (fusion-bev256d2-lss.yaml:55-73)
        lidar.backbone = SparseEncoderSkeleton()
        self.encoders = nn.Module()
        self.encoders.camera = cam
        self.encoders.lidar = lidar
        self.fuser = ConvFuserSkeleton(cin=336, cout=256)
        self.decoder = nn.Module()
        self.decoder.backbone = SECONDSkeleton()
        self.decoder.neck = SECONDFPNSkeleton()
        self.heads = nn.Module()
        self.heads.map = BEVSegmentationHeadSkeleton(cin=512)
