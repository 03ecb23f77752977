DELETE { _:b <urn:p> ?o } WHERE { ?s <urn:p> ?o }
