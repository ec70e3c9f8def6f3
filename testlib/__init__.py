"""End-to-end example/driver scripts (parity with /root/reference/TestLib/)."""
