"""spark-submit driver shim — the file spark-submit executes on a cluster
(spark-submit runs a script, not ``python -m``; the package itself ships
via --py-files):

    spark-submit --master <cluster> \\
        --py-files dist/aads_spark_pyfiles.zip \\
        scripts/submit_app.py validate --images s3://.../images \\
        --reference s3://.../reference --checkpoint s3://.../ck

All argument handling lives in the package CLI
(approximate_anomaly_detection_in_data_streams_spark.__main__) — detect
and validate modes, reference-compatible flags. Under spark-submit the
session builder does NOT force a master (see session.get_spark), so the
submitted cluster manager wins.
"""

import sys

from approximate_anomaly_detection_in_data_streams_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
