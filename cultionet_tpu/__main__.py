"""``python -m cultionet_tpu`` runs the CLI."""

from .scripts.cli import main

if __name__ == "__main__":
    main()
