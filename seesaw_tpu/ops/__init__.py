"""Device-side compute primitives (jit/pjit/Pallas).

The four numeric primitives of the system (SURVEY.md §7):
  P1 embed   — models/ (CLIP ViT) + ops.tiling
  P2 score   — ops.frame_scoring: fused matvec + distinct-frame top-k +
               frame augmentation
  P3 graph   — ops.knn, ops.propagation
  P4 fit     — ops.rank_loss, ops.lbfgs, learners/
"""
