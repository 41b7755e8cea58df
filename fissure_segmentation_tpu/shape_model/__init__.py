from .ssm import SSMParams, fit_ssm, ssm_project, ssm_decode, ssm_random_samples, save_ssm, load_ssm  # noqa: F401
