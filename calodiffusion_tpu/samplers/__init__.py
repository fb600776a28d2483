from calodiffusion_tpu.samplers.registry import get_sampler, SAMPLER_REGISTRY  # noqa: F401
