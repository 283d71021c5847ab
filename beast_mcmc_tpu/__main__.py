"""The `beast`-equivalent CLI entry point (VERDICT r1 item 10).

    python -m beast_mcmc_tpu run analysis.xml [-seed N] [-chain_length N]
        [-save_state FILE] [-load_state FILE] [-particles DIR]
        [-log FILE] [-trees FILE] [-testxml] [-scale F] [-overwrite]

Mirrors the reference's BeastMain flag surface (ref:
src/dr/app/beast/BeastMain.java:370-460: -seed, -save_state/-load_state,
-particles, -overwrite; the XML file is the analysis). Two execution
modes:

  - default: the declarative importer (config/xml_import.py ->
    AnalysisSpec -> apps/runner.run_analysis) for BEAUti-style
    single-analysis files — writes Tracer-compatible tab logs + NEXUS
    tree logs;
  - -testxml: the TestXML interpreter (config/interpreter.py) for
    reference test files with multiple <mcmc> blocks and embedded
    <traceAnalysis><expectation> assertions.

Sub-tools keep the reference's app names:
    python -m beast_mcmc_tpu loganalyser|logcombiner|treeannotator ...
(ref: LogAnalyser.java, LogCombiner.java, treeannotator/TreeAnnotator.java)
"""

from __future__ import annotations

import argparse
import os
import sys


def _cmd_run(argv):
    # the deployment dtype policy: hot tensors f32, log-density
    # reductions and carried posteriors f64 (accumulate-high,
    # utils/accum.py) — requires x64 enabled, as in bench.py
    import jax

    jax.config.update("jax_enable_x64", True)
    p = argparse.ArgumentParser(
        prog="beast_mcmc_tpu run",
        description="Run a BEAST XML analysis (BeastMain role)",
    )
    p.add_argument("xml", help="BEAST XML analysis file")
    p.add_argument("-seed", type=int, default=None)
    p.add_argument("-chain_length", type=int, default=None,
                   help="override <mcmc chainLength>")
    p.add_argument("-save_state", default=None, metavar="FILE")
    p.add_argument("-load_state", default=None, metavar="FILE")
    p.add_argument("-particles", default=None, metavar="DIR",
                   help="folder of particle checkpoints (SMC restart; "
                        "ref BeastMain.java:434)")
    p.add_argument("-log", default=None, help="parameter log file")
    p.add_argument("-trees", default=None, help="NEXUS tree log file")
    p.add_argument("-overwrite", action="store_true")
    p.add_argument("-mc3_chains", type=int, default=1,
                   help="number of Metropolis-coupled chains "
                        "(ref BeastMain.java:436)")
    p.add_argument("-mc3_delta", type=float, default=None,
                   help="temperature increment parameter")
    p.add_argument("-mc3_temperatures", default=None,
                   help="comma-separated hot-chain temperatures")
    p.add_argument("-mc3_swap", type=int, default=100,
                   help="states between chain swap attempts")
    p.add_argument("-testxml", action="store_true",
                   help="run through the TestXML interpreter "
                        "(multi-mcmc blocks + embedded assertions)")
    p.add_argument("-scale", type=float, default=1.0,
                   help="chain-length scale factor (testxml mode)")
    args = p.parse_args(argv)

    for f in (args.log, args.trees):
        if f and os.path.exists(f) and not args.overwrite:
            p.error(f"{f} exists (use -overwrite)")

    if args.testxml:
        from beast_mcmc_tpu.config.interpreter import run_testxml

        res = run_testxml(
            args.xml, scale=args.scale, seed=args.seed or 666,
            max_states=args.chain_length or 10**9,
        )
        for fname, name, mean, exp, se in res:
            print(f"E[{name}] = {mean:.6g} (expected {exp:.6g}, "
                  f"SE {se:.3g}) OK")
        print(f"{args.xml}: all embedded checks passed")
        return 0

    from beast_mcmc_tpu.config.xml_import import (
        XmlImportError,
        parse_beast_xml,
    )
    from beast_mcmc_tpu.apps.runner import run_analysis

    try:
        spec = parse_beast_xml(open(args.xml).read())
    except (NotImplementedError, XmlImportError) as e:
        # ONE vocabulary, two engines: anything beyond the declarative
        # importer's subset runs through the full interpreter registry
        # (config/interpreter.py — same tag semantics, executable
        # closures instead of an AnalysisSpec)
        print(f"[importer: {e}; running through the interpreter registry]")
        from beast_mcmc_tpu.config.interpreter import XmlAnalysis

        ax = XmlAnalysis(
            args.xml, seed=args.seed or 666,
            max_states=args.chain_length or 10**9,
            workdir=os.getcwd(),
            # the reference only WARNS on failed trace expectations
            # (TraceAnalysisParser.java:108-112); -testxml mode is strict
            strict_expectations=False,
        )
        ax.run()
        print(f"{args.xml}: analysis complete "
              f"(logs written beside the XML's fileName attributes)")
        return 0
    if args.seed is not None:
        spec.mcmc.seed = args.seed
    if args.chain_length is not None:
        spec.mcmc.chain_length = args.chain_length

    base = os.path.splitext(os.path.basename(args.xml))[0]
    log_file = args.log or f"{base}.log"
    tree_file = args.trees or f"{base}.trees"

    if args.particles:
        from beast_mcmc_tpu.config.builder import build
        from beast_mcmc_tpu.inference.mcmc import (
            init_mcmc_state,
            make_mcmc_step,
        )
        from beast_mcmc_tpu.inference.smc import load_particles, run_particles
        import jax

        analysis = build(spec)
        step = make_mcmc_step(analysis.log_posterior, analysis.operators)
        template = init_mcmc_state(
            analysis.params0, analysis.tree0,
            jax.random.PRNGKey(spec.mcmc.seed), analysis.operators,
            analysis.log_posterior,
        )
        particles = load_particles(args.particles, template)
        out = run_particles(step, particles, spec.mcmc.chain_length,
                            out_folder=args.particles + ".out")
        print(f"advanced {jax.tree_util.tree_leaves(out)[0].shape[0]} "
              f"particles by {spec.mcmc.chain_length} states "
              f"-> {args.particles}.out")
        return 0

    mc3_temps = (None if args.mc3_temperatures is None else
                 [float(x) for x in args.mc3_temperatures.split(",")])
    result = run_analysis(
        spec, log_file=log_file, tree_file=tree_file,
        checkpoint_file=args.save_state, load_state=args.load_state,
        mc3_chains=args.mc3_chains, mc3_delta=args.mc3_delta,
        mc3_temperatures=mc3_temps, mc3_swap=args.mc3_swap,
    )
    print(result.report)
    print(f"{result.states_per_sec:.1f} states/sec; logs: {log_file}, "
          f"{tree_file}")
    return 0


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "run":
        return _cmd_run(rest)
    if cmd == "loganalyser":
        from beast_mcmc_tpu.apps.loganalyser import main as m

        return m(rest)
    if cmd == "logcombiner":
        from beast_mcmc_tpu.apps.logcombiner import main as m

        return m(rest)
    if cmd == "treeannotator":
        from beast_mcmc_tpu.apps.treeannotator import main as m

        return m(rest)
    if cmd == "seqgen":
        from beast_mcmc_tpu.apps.seqgen import main as m

        return m(rest)
    if cmd == "treestat":
        from beast_mcmc_tpu.apps.treestat import main as m

        return m(rest)
    print(f"unknown command {cmd!r}; try: run, loganalyser, logcombiner, "
          f"treeannotator, seqgen, treestat", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
