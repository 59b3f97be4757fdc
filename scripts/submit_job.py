"""spark-submit entry point: forwards to the package CLI.

spark-submit takes a SCRIPT, not a module, and distributes the library via
``--py-files`` — so this file is the only thing that lives outside the zip.
It must not import anything at module scope except the stdlib: the package
arrives on sys.path from the zip AFTER the Spark context bootstraps it.

    spark-submit --master <cluster> \\
        --py-files dist/slower_whisper_spark-<ver>-<hash>.zip \\
        scripts/submit_job.py validate <table> --suite <spec> [...]

(`--master` on the submit line wins over the CLI's --master flag; the CLI
only creates a session if one wasn't already injected by spark-submit.)
"""

import sys

if __name__ == "__main__":
    from slower_whisper_spark.cli import main

    sys.exit(main(sys.argv[1:]))
