"""Place recognition: binary-descriptor retrieval replacing DBoW2.

The reference ships a 145 MB pretrained ORB vocabulary (absent from the
mount) and scores via an inverted file (``KeyFrameDatabase``). The
TPU-native replacement aggregates each frame's descriptors into a dense
L1-normalized word histogram via multi-band bit-sampling LSH — descriptor
→ word is a gather, frame → signature is a scatter-add, and scoring every
keyframe at once is ONE matvec on the MXU (the inverted file's sparsity
trick buys nothing when the whole database fits in HBM and the matvec is
a microsecond).
"""
