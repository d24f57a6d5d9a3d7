#!/usr/bin/env python
"""spark-submit driver script for sketch_spark jobs.

Usage (the --py-files artifact comes from
``sketch_spark.session.package_zip()``):

    spark-submit --master <cluster-or-local[N]> \
        --py-files /path/to/sketch_spark.zip \
        scripts/run_job.py build --input /data/pages --out /data/states

See ``sketch_spark/cli.py`` for subcommands.
"""

from sketch_spark.cli import main

if __name__ == "__main__":
    main()
