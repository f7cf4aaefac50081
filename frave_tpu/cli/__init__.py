"""Command-line interface with the reference CLI's surface.

Reference: crates/fri-cli/src/main.rs:29-46 — subcommands {encode, decode,
bench, optimize} plus global --verbose/--quiet. Image IO via PIL instead
of the Rust `image` crate; any PIL-supported format is accepted (the
reference supported PNG/BMP only, encode.rs:35-39, and panicked on other
formats — here unsupported modes are converted or rejected with an error).
"""

from .main import main

__all__ = ["main"]
