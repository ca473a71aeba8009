#!/usr/bin/env python
"""Generate the per-subject HOCON configs (PeopleSnapshot + CUHKszCAP
large-pose scenes) from the subject schedule table.

The table mirrors the reference's per-subject tuning
(``configs/people_snapshot/*.conf``, ``configs/female_large_pose/*.conf``
in GAP-LAB-CUHK-SZ/REC-MV): training length, A-pose skinner type,
LR milestones, hierarchy promotion epochs and per-phase feature-line
projection weights vary per subject; everything else is the shared
REC-MV recipe. Large-pose variants disable the curve-aware hemline loss
(the curve branch is frozen in that stage) and raise the DCT temporal
prior.

Run from the repo root:  python tools/make_subject_configs.py
"""

from __future__ import annotations

import os
import os.path as osp

# subject: (nepoch, skinner_pose_type, milestones, medium_start,
#           fine_start, (fl_w_coarse, fl_w_medium, fl_w_fine))
PEOPLE_SNAPSHOT = {
    "female-3-casual": (200, 0, (10, 30, 80, 120), 8, 12, (0.004, 0.003, 0.002)),
    "female-3-sport": (400, 2, (30, 60, 160, 260), 24, 36, (0.004, 0.002, 0.001)),
    "female-4-casual": (400, 2, (30, 60, 160, 260), 24, 36, (0.004, 0.002, 0.001)),
    "female-4-sport": (400, 2, (30, 60, 160, 260), 24, 36, (0.004, 0.002, 0.001)),
    "female-6-plaza": (200, 2, (10, 30, 80, 120), 8, 12, (0.004, 0.002, 0.001)),
    "female-7-plaza": (400, 2, (30, 60, 160, 260), 24, 36, (0.004, 0.002, 0.001)),
    "male-1-casual": (120, 3, (10, 20, 50, 80), 8, 12, (0.004, 0.002, 0.001)),
    "male-1-plaza": (200, 2, (10, 30, 60, 120), 24, 36, (0.004, 0.002, 0.001)),
    "male-1-sport": (200, 3, (10, 30, 80, 130), 8, 12, (0.004, 0.002, 0.002)),
    "male-2-casual": (200, 1, (10, 30, 80, 130), 12, 16, (0.004, 0.003, 0.002)),
    "male-2-outdoor": (120, 3, (10, 20, 50, 80), 8, 12, (0.004, 0.002, 0.001)),
    "male-4-casual": (120, 3, (10, 20, 50, 80), 8, 12, (0.004, 0.002, 0.001)),
    "male-5-outdoor": (120, 3, (10, 20, 50, 80), 8, 12, (0.004, 0.002, 0.001)),
    "male-9-plaza": (120, 3, (10, 20, 50, 80), 8, 12, (0.004, 0.002, 0.001)),
}

LARGE_POSE = {
    "anran_tic": (400, 2, (30, 60, 160, 260), 24, 36, (0.004, 0.002, 0.001)),
    "leyang_jump": (400, 1, (30, 60, 160, 260), 18, 36, (0.004, 0.002, 0.001)),
    "lingteng_dance": (400, 1, (30, 60, 160, 260), 24, 36, (0.004, 0.002, 0.001)),
}

# shared recipe (identical across subjects in the reference)
PHASES = (
    # phase,  radius,  remesh, batch, color_w, pc_w, curve_aware, fl_sdf, dct, alpha_c, alpha_d, defcons
    ("coarse", 0.006, 30, 3, 0.5, 60.0, 60.0, 10.0, 2.0, 1.0, 0.1, 0.6),
    ("medium", 0.00465, 60, 2, 1.0, 30.0, 30.0, 5.0, 3.0, 0.5, 0.05, 0.2),
    ("fine", 0.0041, 120, 1, 1.0, 10.0, 10.0, 1.0, 4.0, 0.1, 0.02, 0.1),
)
LARGE_POSE_DCT = {"coarse": 4.0, "medium": 9.0, "fine": 12.0}


def loss_block(phase_row, fl_w, large_pose=False):
    (phase, _r, _ri, _b, color_w, pc_w, ca_w, fl_sdf, dct, a_c, a_d, dc) = phase_row
    if large_pose:
        ca_w = 0.0
        dct = LARGE_POSE_DCT[phase]
    lines = [f"loss_{phase} {{"]
    if phase == "fine":
        lines.append("  sample_pix_num = 6144")
    lines += [
        f"  color_weight = {color_w}",
        "  normal_weight = 0.1",
        "  weighted_normal = true",
        "  grad_weight = 1.0",
        "  offset_weight = 0.0",
        f"  def_regu {{ weight = {0.07 if phase == 'fine' else 0.1}  c = 0.5 }}",
        f"  dct_weight = {dct}",
        "  pc_weight {",
        f"    weight = {pc_w}",
        "    laplacian_weight = -10.0" if phase == "coarse" else "    laplacian_weight = -1.0",
        "    edge_weight = -10.0",
        "    norm_weight = -0.001",
        f"    def_consistent {{ weight = {dc}  c = 0.01 }}",
        f"    curve_aware_weight = {ca_w}",
        "  }",
        "  fl_weight {",
        f"    sdf_weight = {fl_sdf}",
        f"    weight = {fl_w}",
        "    laplacian_weight = 10.0",
        "    edge_weight = 10.0",
        f"    def_consistent {{ weight = {dc}  c = 0.01 }}",
        "  }",
        f"  alpha_weight {{ center_weight = {a_c}  diff_weight = {a_d} }}",
        "  fl_visible_method = zbuff",
        "}",
    ]
    return "\n".join(lines)


def subject_conf(name, row, data_type, large_pose=False):
    nepoch, pose_type, milestones, med, fine, fl_ws = row
    phases_txt = []
    for prow, start in zip(PHASES, (0, med, fine)):
        phase, radius, remesh, batch = prow[0], prow[1], prow[2], prow[3]
        phases_txt.append(
            f"  {phase} {{\n"
            f"    start_epoch = {start}\n"
            f"    point_render {{ radius = {radius}  "
            f"remesh_intersect = {remesh}  batch_size = {batch} }}\n"
            f"  }}"
        )
    ms = " ".join(str(m) for m in milestones)
    head = f"""\
# {name}{' (large-pose stage)' if large_pose else ''} — subject schedule per the
# reference config of the same name (REC-MV configs/{data_type} tree).
train {{
  data_type = {'people_snap' if data_type == 'people_snapshot' else 'large_pose'}
  garment_type = {name}
  is_upper_bottom = False
  nepoch = {nepoch}
  sample_pix_num = 2048
  initial_iters = -1200
  skinner_pose_type = {pose_type}
  shuffle = true
  num_workers = 0
  opt_pose = true
  opt_trans = true
  opt_camera {{
    focal_length = true
    princeple_points = true
    quat = false
    T = true
  }}
  learning_rate = 0.0001
  scheduler {{ type = "MultiStepLR"  milestones = [ {ms} ]  factor = 0.333 }}
{chr(10).join(phases_txt)}
}}
sdf_net {{ multires = 6 }}
garment_sdf_net {{ multires = 6 }}
mlp_deformer {{
  type = "MLPTranslator"
  condlen = 128
  multires = 6
}}
render_net {{
  type = "RenderingNetwork_view_norm"
  multires_p = 0
  multires_x = 0
  multires_n = 0
  multires_v = 4
  condlen = 256
}}
"""
    blocks = [loss_block(p, w, large_pose) for p, w in zip(PHASES, fl_ws)]
    return head + "\n".join(blocks) + "\n"


def main():
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    ps_dir = osp.join(root, "configs", "people_snapshot")
    lp_dir = osp.join(root, "configs", "female_large_pose")
    os.makedirs(ps_dir, exist_ok=True)
    os.makedirs(lp_dir, exist_ok=True)
    for name, row in PEOPLE_SNAPSHOT.items():
        with open(osp.join(ps_dir, f"{name}.conf"), "w") as f:
            f.write(subject_conf(name, row, "people_snapshot"))
    for name, row in LARGE_POSE.items():
        with open(osp.join(lp_dir, f"{name}.conf"), "w") as f:
            f.write(subject_conf(name, row, "female_large_pose"))
        with open(osp.join(lp_dir, f"{name}_large_pose.conf"), "w") as f:
            f.write(subject_conf(name, row, "female_large_pose",
                                 large_pose=True))
    print(f"wrote {len(PEOPLE_SNAPSHOT)} people_snapshot + "
          f"{2 * len(LARGE_POSE)} large-pose configs")


if __name__ == "__main__":
    main()
