"""Hub entry point, mirroring the reference's s3prl hook
(reference fithubert/hubconf.py:3-13): `fithubert(ckpt, model_config)`
returns the upstream expert wrapping the trained student."""

from fithubert_tpu.export.expert import UpstreamExpert


def fithubert(ckpt: str, model_config: str, *args, **kwargs) -> UpstreamExpert:
    """ckpt: trained weights (.msgpack from export_student, or a reference
    lightning .ckpt); model_config: the dumped yaml for that run."""
    assert ckpt and model_config, "both ckpt and model_config are required"
    return UpstreamExpert(ckpt, model_config, *args, **kwargs)


fithubert_local = fithubert
