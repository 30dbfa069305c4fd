"""Params config object: defaults, YML roundtrip, signatures."""

import dataclasses

from ucoslam_tpu.config import DescriptorType, Params


def test_defaults_match_reference():
    # Reference defaults: src/ucoslamtypes.cpp:24-52.
    p = Params()
    assert p.detectMarkers and p.detectKeyPoints
    assert p.kpDescriptorType == DescriptorType.ORB
    assert p.maxFeatures == 4000
    assert p.nOctaveLevels == 8
    assert abs(p.scaleFactor - 1.2) < 1e-9
    assert abs(p.KFMinConfidence - 0.6) < 1e-9
    assert abs(p.KFCulling - 0.8) < 1e-9
    assert p.maxNewPoints == 350
    assert p.projDistThr == 15
    assert p.aruco_Dictionary == "ARUCO_MIP_36h12"


def test_set_params():
    p = Params().setParams(sequential=True, desc=DescriptorType.ORB)
    assert p.runSequential
    assert p.maxDescDistance == 50.0


def test_yml_roundtrip(tmp_path):
    p = Params().replace(maxFeatures=1234, KFMinConfidence=0.7, aruco_Dictionary="X9")
    path = str(tmp_path / "p.yml")
    p.save_yml(path)
    q = Params.load_yml(path)
    assert q.maxFeatures == 1234
    assert abs(q.KFMinConfidence - 0.7) < 1e-6
    assert q.aruco_Dictionary == "X9"
    assert q == p


def test_signature_sensitive_to_fields():
    a = Params()
    b = a.replace(maxFeatures=4001)
    assert a.signature() != b.signature()
    assert a.signature() == Params().signature()


def test_hashable_static_arg():
    # Params must be usable as a jit static argument.
    assert hash(Params()) == hash(Params())
    d = {Params(): 1}
    assert d[Params()] == 1


def test_dict_roundtrip():
    p = Params().replace(runSequential=False, kpDescriptorType=DescriptorType.BRISK)
    q = Params.from_dict(p.to_dict())
    assert p == q
    assert dataclasses.asdict(p) == dataclasses.asdict(q)


def test_extra_params_escape_hatch():
    """extraParams `key=value` overrides (ucoslamtypes.h:133) are parsed
    and applied by Params.effective()."""
    p = Params().replace(extraParams="KFCulling=0.5 maxNewPoints=123 detectMarkers=0")
    e = p.effective()
    assert e.KFCulling == 0.5
    assert e.maxNewPoints == 123
    assert e.detectMarkers is False
    # unknown keys and junk are tolerated (reference attemtpRead semantics)
    assert Params().replace(extraParams="nope=1 bad").effective() == Params().replace(
        extraParams="nope=1 bad"
    )


def test_kf_min_confidence_changes_keyframe_count():
    """KFMinConfidence must actually gate keyframe insertion
    (ucoslamtypes.h:95; the knob KITTI presets tune)."""
    from ucoslam_tpu.io.synthetic import SyntheticSequence
    from ucoslam_tpu.slam.system import System

    base = Params().replace(
        maxMapPoints=4096, maxKeyFrames=32, maxKeyPointsPerFrame=512,
        maxDescDistance=60.0, detectMarkers=False,
    )
    counts = {}
    for conf in (0.0, 1.01):  # 1.01 can never qualify -> init keyframes only
        seq = SyntheticSequence(n_frames=25, seed=11)
        sys_ = System(base.replace(KFMinConfidence=conf), seq.cam)
        for i in range(seq.n_frames):
            sys_.process_frame(seq.frame(i))
        counts[conf] = sys_.map.n_keyframes
    assert counts[1.01] < counts[0.0], counts


def test_max_features_bounds_detector_budget():
    """maxFeatures (ucoslamtypes.h:98) bounds the extractor budget even
    when the frame's padded capacity is larger."""
    import numpy as np

    from ucoslam_tpu.features.frame_extractor import FrameExtractor
    from ucoslam_tpu.io.synthetic import SyntheticSequence

    seq = SyntheticSequence(n_frames=1, seed=5, n_points=800)
    p = Params().replace(
        maxKeyPointsPerFrame=512, maxFeatures=128, detectMarkers=False,
        nOctaveLevels=4,
    )
    fe = FrameExtractor(p, seq.cam)
    f = fe.process(seq.render(0), 0)
    assert f.valid.shape[0] == 512  # padded to capacity
    assert int(np.asarray(f.valid).sum()) <= 128
