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
