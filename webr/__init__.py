"""webr — PySpark-native web-page entity-resolution engine.

A regular package on purpose: zipimport (the ``spark-submit --py-files
webr.zip`` path, north_rule) does not support PEP-420 namespace packages,
so without this file executors and cluster-mode drivers cannot import the
shipped zip even though local-mode PYTHONPATH imports work.
"""
