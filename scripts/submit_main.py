"""Minimal spark-submit driver: everything real lives in the zip."""
import sys
from document_extractor_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
