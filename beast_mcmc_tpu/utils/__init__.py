from beast_mcmc_tpu.utils.dtypes import default_float, set_default_float
