"""Web serving layer: HTTP API + per-session state (reference seesaw/web).

Endpoint set and wire schemas mirror the reference FastAPI app so the Vue
frontend's protocol carries over; the server is a dependency-free threaded
stdlib HTTP server, and sessions are in-process objects with per-session
locks instead of Ray actors.
"""

from .common import AppState, SessionReq, ResetReq, Worker, g_queries  # noqa: F401
from .session_manager import SessionManager, WebSession  # noqa: F401
from .app import SeesawServer  # noqa: F401
