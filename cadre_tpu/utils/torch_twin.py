"""Torch twin of the DANet architecture — baseline + parity harness.

A from-scratch PyTorch implementation of the reference architecture contract
(carla_perception/Networks/danet.py and blocks), used for two purposes only:
  1. checkpoint-import parity tests (its state_dict uses reference key names,
     so `import_danet_torch` sees reference-format checkpoints), and
  2. the PyTorch-CPU throughput baseline in bench.py (BASELINE target:
     >=10x torch-CPU perception throughput).

This is NOT part of the TPU compute path — torch is imported lazily.
"""
from __future__ import annotations


def build_torch_twin(cfg):
    """Build the twin for a given DANetParams. Returns an eval-mode module."""
    import torch
    import torch.nn as tnn

    H, W = cfg.feat_h, cfg.feat_w

    def _bb_block(cin, cout, stride=1):
        m = tnn.Module()
        m.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        m.bn1 = tnn.BatchNorm2d(cout)
        m.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        m.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            m.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            m.downsample = None
        return m

    def _bb_fwd(m, x):
        idt = x if m.downsample is None else m.downsample(x)
        y = torch.relu(m.bn1(m.conv1(x)))
        y = m.bn2(m.conv2(y))
        return torch.relu(y + idt)

    class TorchTwin(tnn.Module):
        def __init__(self):
            super().__init__()
            C = cfg.da_feature_channel
            z = cfg.z_dims
            ia = cfg.inter_att_dims

            bb = tnn.Module()
            bb.conv1 = tnn.Conv2d(cfg.input_channel, 64, 7, 2, 3, bias=True)
            bb.bn1 = tnn.BatchNorm2d(64)
            chans = [64, 128, 256, 512]
            cin = 64
            for s, ch in enumerate(chans):
                blocks = [_bb_block(cin, ch, 1 if s == 0 else 2),
                          _bb_block(ch, ch)]
                setattr(bb, f"layer{s + 1}", tnn.Sequential(*blocks))
                cin = ch
            self.backbone = bb

            inter = 512 // 4
            dh = tnn.Module()
            for nm in ["conv5a", "conv5c"]:
                setattr(dh, nm, tnn.Sequential(
                    tnn.Conv2d(512, inter, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(inter), tnn.ReLU()))
            for nm in ["conv51", "conv52"]:
                setattr(dh, nm, tnn.Sequential(
                    tnn.Conv2d(inter, inter, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(inter), tnn.ReLU()))
            sa = tnn.Module()
            sa.query_conv = tnn.Conv2d(inter, inter // 8, 1)
            sa.key_conv = tnn.Conv2d(inter, inter // 8, 1)
            sa.value_conv = tnn.Conv2d(inter, inter, 1)
            sa.gamma = tnn.Parameter(torch.zeros(1))
            dh.sa = sa
            sc = tnn.Module()
            sc.gamma = tnn.Parameter(torch.zeros(1))
            dh.sc = sc
            dh.conv8 = tnn.Sequential(tnn.Dropout2d(0.1, False),
                                      tnn.Conv2d(inter, C, 1))
            self.da_head = dh

            self.visual_conv = tnn.Conv2d(C, C, 1)
            self.bc_conv = tnn.Conv2d(C, C, 1)

            def qkv():
                return tnn.Sequential(
                    tnn.Flatten(), tnn.Linear(C * H * W, ia),
                    tnn.LeakyReLU(), tnn.Linear(ia, z))

            ita = tnn.Module()
            for nm in ["visual_query_layer", "visual_key_layer",
                       "visual_value_layer", "bc_query_layer",
                       "bc_key_layer", "bc_value_layer"]:
                setattr(ita, nm, qkv())
            self.inter_task_att = ita

            vb = tnn.Module()
            vb.reverse_feature = tnn.Sequential(
                tnn.Linear(z, 512), tnn.LeakyReLU(),
                tnn.Linear(512, 512 * H * W))

            def decoder(out_c, first_opad):
                dims = [512, 256, 128, 64, 32]
                mods = []
                for i in range(4):
                    mods += [tnn.ConvTranspose2d(
                        dims[i], dims[i + 1], 3, 2, 1,
                        output_padding=first_opad if i == 0 else 1),
                        tnn.BatchNorm2d(dims[i + 1]), tnn.LeakyReLU()]
                mods.append(tnn.ConvTranspose2d(32, out_c, 3, 2, 1,
                                                output_padding=1))
                return tnn.Sequential(*mods)

            # first-stage output padding (0,1) iff target height chain is
            # the reference's 5->9 (visual_branch.py:146-152)
            fo = (0, 1) if cfg.image_height == 144 else 1
            vb.reverse_image = decoder(cfg.camera_output_channel, fo)
            vb.reverse_route = decoder(1, fo)
            vb.reverse_lightState = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(512 * H * W, 256), tnn.LeakyReLU(),
                tnn.Linear(256, 64), tnn.LeakyReLU(),
                tnn.Linear(64, cfg.light_classes_num))
            self.visual_branch = vb

            bc = tnn.Module()
            bc.bc_model = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(z, z // 2), tnn.LeakyReLU(),
                tnn.Linear(z // 2, 2))
            self.bc_branch = bc
            self.in_bc_speed_fc = tnn.Sequential(
                tnn.Flatten(), tnn.Linear(1, 64), tnn.LeakyReLU(),
                tnn.Linear(64, z))
            self.z = z

        def trunk(self, x):
            bb = self.backbone
            y = torch.relu(bb.bn1(bb.conv1(x)))
            y = tnn.functional.max_pool2d(y, 3, 2, 1)
            for s in range(4):
                for blk in getattr(bb, f"layer{s + 1}"):
                    y = _bb_fwd(blk, y)
            dh = self.da_head
            f1 = dh.conv5a(y)
            b, c, h, w = f1.shape
            q = dh.sa.query_conv(f1).view(b, -1, h * w).permute(0, 2, 1)
            k = dh.sa.key_conv(f1).view(b, -1, h * w)
            att = torch.softmax(torch.bmm(q, k), dim=-1)
            v = dh.sa.value_conv(f1).view(b, -1, h * w)
            sa_out = torch.bmm(v, att.permute(0, 2, 1)).view(b, c, h, w)
            sa_out = dh.sa.gamma * sa_out + f1
            sa_out = dh.conv51(sa_out)

            f2 = dh.conv5c(y)
            xf = f2.view(b, c, -1)
            energy = torch.bmm(xf, xf.permute(0, 2, 1))
            energy = energy.max(-1, keepdim=True)[0].expand_as(energy) - energy
            catt = torch.softmax(energy, dim=-1)
            sc_out = torch.bmm(catt, xf).view(b, c, h, w)
            sc_out = dh.sc.gamma * sc_out + f2
            sc_out = dh.conv52(sc_out)

            da = dh.conv8(sa_out + sc_out)
            return self.visual_conv(da), self.bc_conv(da)

        def zs(self, dv, db):
            b = dv.shape[0]
            ita = self.inter_task_att
            dvf, dbf = dv.reshape(b, -1), db.reshape(b, -1)
            vq, vk, vv = (ita.visual_query_layer(dvf),
                          ita.visual_key_layer(dvf),
                          ita.visual_value_layer(dvf))
            bq, bk, bv = (ita.bc_query_layer(dbf), ita.bc_key_layer(dbf),
                          ita.bc_value_layer(dbf))
            temp = self.z ** 0.5

            def cross(q, k, v):
                e = torch.bmm((q / temp).view(b, -1, 1), k.view(b, 1, -1))
                a = torch.softmax(e, dim=-1)
                out = torch.bmm(v.view(b, 1, -1),
                                a.permute(0, 2, 1)).view(b, -1)
                return out + v

            return cross(bq, vk, vv), cross(vq, bk, bv)

        def latent(self, x):
            dv, db = self.trunk(x)
            zv, zb = self.zs(dv, db)
            return torch.cat([zv, zb], dim=-1)

        def forward(self, x, speed):
            dv, db = self.trunk(x)
            zv, zb = self.zs(dv, db)
            zb = zb + self.in_bc_speed_fc(speed)
            feat = self.visual_branch.reverse_feature(zv).view(-1, 512, H, W)
            cam = self.visual_branch.reverse_image(feat)
            route = torch.sigmoid(self.visual_branch.reverse_route(feat))
            light = self.visual_branch.reverse_lightState(
                feat.reshape(feat.shape[0], -1))
            bc = self.bc_branch.bc_model(zb)
            return cam, route, light, bc

    return TorchTwin().eval()
