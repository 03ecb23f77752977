DELETE DATA { <urn:s> <urn:p> ?o }
