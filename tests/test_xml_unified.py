"""ONE vocabulary, two engines (VERDICT r2 item 7 / r3 item 8).

The declarative importer (config/xml_import.py -> AnalysisSpec) must be
a strict SUBSET of the interpreter registry (config/interpreter.py):
every tag the importer understands also has a registered interpreter
builder, and the CLI falls back to the interpreter for anything beyond
the importer's subset (ref: BeastParser.java:97-112 — a single parser
registry behind every entry point)."""

import re


IMPORTER_TAGS = [
    "alignment", "patterns", "taxon", "sequence", "parameter",
    "constantSize", "exponentialGrowth", "gmrfSkyGridLikelihood",
    "yuleModel", "birthDeathModel",
    "HKYModel", "gtrModel", "jcModel", "siteModel",
    "strictClockBranchRates", "discretizedBranchRates",
    "treeLikelihood", "treeDataLikelihood",
    "logNormalPrior", "normalPrior", "gammaPrior", "exponentialPrior",
    "uniformPrior", "oneOnXPrior", "ctmcScalePrior",
]


def _registry():
    from beast_mcmc_tpu.config import interpreter  # noqa: F401
    from beast_mcmc_tpu.config import (  # noqa: F401
        xml_ext, xml_field, xml_geo, xml_hmc, xml_traits,
    )
    from beast_mcmc_tpu.config.interpreter import _BUILDERS, _OP_EXT

    return _BUILDERS, _OP_EXT


CASE_ALIASES = {"HKYModel": ("hkyModel", "HKYModel")}


def test_importer_vocabulary_is_interpreter_subset():
    builders, _ = _registry()
    missing = []
    for tag in IMPORTER_TAGS:
        names = CASE_ALIASES.get(tag, (tag,))
        if not any(n in builders for n in names):
            missing.append(tag)
    assert not missing, (
        f"importer-only vocabulary (breaks the one-registry contract): "
        f"{missing}")


def test_cli_falls_back_to_interpreter():
    """The run entry point routes importer-unsupported documents through
    the interpreter registry (the unification seam)."""
    import beast_mcmc_tpu.__main__ as M
    import inspect

    src = inspect.getsource(M)
    assert "XmlImportError" in src and "XmlAnalysis" in src
