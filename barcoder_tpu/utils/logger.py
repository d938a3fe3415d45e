"""Rich-console logger with the reference's observability contract
(Logger.py:12-94): RichHandler on stderr, custom SUBPROC (25) and HELP (15)
levels, locale-aware number formatting of numeric tokens, pretty JSON dumps.
stdout stays reserved for machine-readable TSV/JSON output.
"""

from __future__ import annotations

import json
import locale
import logging
import re

# a number standing alone between whitespace (or string edges): plain,
# decimal, or exponent form
_NUM_TOKEN = re.compile(
    r"(?<!\S)[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?(?!\S)"
)

from rich.console import Console
from rich.highlighter import JSONHighlighter
from rich.logging import RichHandler
from rich.theme import Theme

try:
    from babel.numbers import format_decimal

    _HAVE_BABEL = True
except ImportError:  # pragma: no cover
    _HAVE_BABEL = False

SUBPROC = 25
HELP = 15

_console: Console | None = None


def get_console() -> Console:
    global _console
    if _console is None:
        _console = Console(
            stderr=True,
            theme=Theme(
                {
                    "logging.level.subproc": "bold blue",
                    "logging.level.help": "bold green",
                }
            ),
        )
    return _console


class Logger:
    """Mixin/standalone logger mirroring the reference Logger class."""

    SUBPROC = SUBPROC
    HELP = HELP

    def __init__(self):
        self.user_locale = locale.getlocale()[0]
        console = get_console()
        root = logging.getLogger("barcoder_tpu")
        if not root.handlers:
            handler = RichHandler(console=console)
            handler.setFormatter(logging.Formatter("%(message)s", datefmt="[%X]"))
            root.addHandler(handler)
            root.propagate = False
        # explicit level: with propagate=False the effective level would
        # otherwise inherit the root default (WARNING) and drop info logs
        root.setLevel(logging.DEBUG)
        self.logger = root
        logging.addLevelName(SUBPROC, "SUBPROC")
        logging.addLevelName(HELP, "HELP")

    def _locale_number(self, num):
        """One number → its locale rendering (babel when available, else
        Python grouping)."""
        if _HAVE_BABEL and self.user_locale:
            try:
                return format_decimal(num, locale=self.user_locale)
            except Exception:
                pass
        return f"{num:,}" if isinstance(num, int) else f"{num:,g}"

    def format_numbers(self, message):
        """Locale-format every standalone numeric token of a message.

        Behavioral contract only from the reference (Logger.py:39-60: any
        whitespace-delimited token that reads as a number gets grouped
        digits); implemented as a single regex substitution over the raw
        string, which also preserves the original whitespace."""
        if isinstance(message, str):
            return _NUM_TOKEN.sub(
                lambda m: str(self._locale_number(float(m.group()))), message
            )
        if isinstance(message, int):
            return str(self._locale_number(message))
        return message

    def info(self, message):
        self.logger.info(self.format_numbers(message))

    def debug(self, message):
        self.logger.debug(self.format_numbers(message))

    def warn(self, message):
        self.logger.warning(self.format_numbers(message))

    warning = warn

    def error(self, message):
        self.logger.error(self.format_numbers(message))

    def subproc(self, message):
        message = self.format_numbers(message) or "No errors reported"
        if self.logger.isEnabledFor(SUBPROC):
            self.logger.log(SUBPROC, message)

    def help(self, message):
        message = self.format_numbers(message) or "No help available"
        if self.logger.isEnabledFor(HELP):
            self.logger.log(HELP, message)

    def json(self, data):
        self.logger.info(
            json.dumps(data, indent=4), extra={"highlighter": JSONHighlighter()}
        )
