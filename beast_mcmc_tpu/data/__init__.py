from beast_mcmc_tpu.data.datatype import (
    NUCLEOTIDES,
    AMINO_ACIDS,
    BINARY,
    DataType,
    general_datatype,
)
from beast_mcmc_tpu.data.alignment import Alignment, SitePatterns
