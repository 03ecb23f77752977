DELETE DATA { _:b <urn:name> "x" }
