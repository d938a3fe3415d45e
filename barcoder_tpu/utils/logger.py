"""Rich-console logger with the reference's observability contract
(Logger.py:12-94): RichHandler on stderr, custom SUBPROC (25) and HELP (15)
levels, locale-aware number formatting of numeric tokens, pretty JSON dumps.
stdout stays reserved for machine-readable TSV/JSON output.
"""

from __future__ import annotations

import json
import locale
import logging

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

    def format_numbers(self, message):
        """Locale-format every numeric token of a message
        (reference: Logger.py:39-60)."""
        if isinstance(message, str):
            lines = message.splitlines()
            for i, line in enumerate(lines):
                words = line.split()
                for j, word in enumerate(words):
                    try:
                        num = float(word)
                    except ValueError:
                        continue
                    if _HAVE_BABEL and self.user_locale:
                        try:
                            words[j] = format_decimal(num, locale=self.user_locale)
                            continue
                        except Exception:
                            pass
                    words[j] = f"{num:,g}"
                lines[i] = " ".join(words)
            return "\n".join(lines)
        if isinstance(message, int):
            if _HAVE_BABEL and self.user_locale:
                try:
                    return format_decimal(message, locale=self.user_locale)
                except Exception:
                    pass
            return f"{message:,}"
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
