from . import camera, deformer, mlp, render_net, sdf, skinner, smpl, translator
